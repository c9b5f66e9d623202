"""Persistent compilation cache plumbing (utils/cache.py).

The reference CLI pays zero compile cost (AOT Rust); ours pays the XLA
compile on the first run only, because every compiled program persists
on disk.  These tests pin the config plumbing; the actual axon-tunnel
round-trip saving is measured in benchmarks (clifull/clistream rows).
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from lightmotif_tpu.utils.cache import enable_persistent_cache


@pytest.fixture(autouse=True)
def _reset_cache_config():
    yield
    jax.config.update("jax_compilation_cache_dir", None)


def test_cache_populates(tmp_path, monkeypatch):
    monkeypatch.delenv("LIGHTMOTIF_TPU_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "xla")
    assert enable_persistent_cache(target) == target
    # a fresh program (shape-keyed) so the entry is really new
    f = jax.jit(lambda x: (x @ x.T).sum())
    f(jnp.ones((48, 48))).block_until_ready()
    assert glob.glob(os.path.join(target, "*"))


def test_env_disable(monkeypatch):
    for off in ("0", "off", "", "FALSE"):
        monkeypatch.setenv("LIGHTMOTIF_TPU_COMPILE_CACHE", off)
        assert enable_persistent_cache() is None


def test_env_path(tmp_path, monkeypatch):
    target = str(tmp_path / "envdir")
    monkeypatch.setenv("LIGHTMOTIF_TPU_COMPILE_CACHE", target)
    assert enable_persistent_cache() == target
    assert os.path.isdir(target)


def test_explicit_path_overrides_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LIGHTMOTIF_TPU_COMPILE_CACHE", "0")
    target = str(tmp_path / "explicit")
    assert enable_persistent_cache(target) == target


def test_unwritable_path_degrades(monkeypatch):
    monkeypatch.delenv("LIGHTMOTIF_TPU_COMPILE_CACHE", raising=False)
    assert enable_persistent_cache("/proc/nope/xla") is None
