"""lightmotif-tpu: a TPU-native motif scanning engine.

A from-scratch JAX/XLA/Pallas framework with the capability set of the
``lightmotif`` reference library: PWM/PSSM construction with
pseudocounts and backgrounds, exact-f32 sequence scoring, max / argmax /
threshold reductions, a two-pass discrete scanner, score<->p-value
conversion (MEME CDF and exact TFM-PVALUE), motif-format parsers
(JASPAR / TRANSFAC / MEME / UniPROBE), a Gibbs sampler for motif
discovery, a FIMO-like CLI, and data-parallel genome scanning over TPU
device meshes.
"""

from __future__ import annotations

__version__ = "0.3.0"

from .alphabet import (
    DNA,
    PROTEIN,
    Alphabet,
    Background,
    InvalidDataError,
    InvalidSymbolError,
    Pseudocounts,
)
from .matrix import (
    CountMatrix,
    DiscreteMatrix,
    FrequencyMatrix,
    ScoringMatrix,
    WeightMatrix,
)
from .dist import ScoreDistribution
from .scores import MatrixCoordinates, Scores, StripedScores
from .sequence import EncodedSequence, StripedSequence
from .scanner import Hit, Scanner
from .sampler import Sampler, SamplerData
from .sampler_batch import (
    BatchSamplerResult,
    BatchSamplerState,
    sample_oops_batch,
    sample_zoops_batch,
)
from .tfmpvalue import TfmPvalue
from .motif import (
    JasparMotif,
    MemeMotif,
    Motif,
    TransfacMotif,
    UniprobeMotif,
)

__all__ = [
    "DNA",
    "PROTEIN",
    "Alphabet",
    "Background",
    "Pseudocounts",
    "InvalidDataError",
    "InvalidSymbolError",
    "CountMatrix",
    "FrequencyMatrix",
    "WeightMatrix",
    "ScoringMatrix",
    "DiscreteMatrix",
    "ScoreDistribution",
    "MatrixCoordinates",
    "Scores",
    "StripedScores",
    "EncodedSequence",
    "StripedSequence",
    "Hit",
    "Scanner",
    "Sampler",
    "SamplerData",
    "sample_oops_batch",
    "sample_zoops_batch",
    "BatchSamplerResult",
    "BatchSamplerState",
    "TfmPvalue",
    "create",
    "stripe",
    "scan",
    "load",
    "Loader",
    "Motif",
    "JasparMotif",
    "TransfacMotif",
    "MemeMotif",
    "UniprobeMotif",
]


def load(file=None, format: str = "jaspar16", protein: bool = False, *,
         data=None):
    """Load motifs from a file (see :func:`lightmotif_tpu.io.load`)."""
    from .io import load as _load

    return _load(file, format=format, protein=protein, data=data)


class Loader:
    """Iterator over motifs in a file (reference ``io.rs:206-315``)."""

    def __init__(self, file, format: str = "jaspar16", protein: bool = False):
        self._it = load(file, format=format, protein=protein)

    def __iter__(self):
        return self._it

    def __next__(self):
        return next(self._it)


# -- convenience API (parity with lightmotif-py ``lib.rs:1351-1470``) --------


def create(sequences, protein: bool = False, name: str | None = None) -> Motif:
    """Create a motif from aligned sequence strings.

    Parity note: like the reference's Python ``create()``
    (``lightmotif-py/lightmotif/lib.rs:1351-1400``), this uses a **zero**
    pseudocount and the uniform background.
    """
    alphabet = PROTEIN if protein else DNA
    encoded = [EncodedSequence.encode(s, alphabet) for s in sequences]
    counts = CountMatrix.from_sequences(encoded)
    pwm = counts.to_freq(0.0).to_weight(None)
    pssm = pwm.to_scoring()
    return Motif(counts=counts, pwm=pwm, pssm=pssm, name=name)


def stripe(sequence, protein: bool = False) -> StripedSequence:
    """Encode and stripe a text sequence."""
    alphabet = PROTEIN if protein else DNA
    return EncodedSequence.encode(sequence, alphabet).to_striped()


def scan(pssm, sequence, threshold: float = 0.0, block_size: int | None = None):
    """Iterate hits of ``pssm`` on ``sequence`` at ``threshold``."""
    from .scanner import Scanner

    scanner = Scanner(pssm, sequence, threshold=threshold)
    if block_size is not None:
        scanner.block_size = block_size
    return scanner
