"""Error types for threecrate-tpu.

Mirrors the reference error taxonomy (threecrate-core/src/error.rs:638-670):
Io / InvalidData / Algorithm / Gpu / Visualization / Unsupported /
UnsupportedFormat, re-expressed as a Python exception hierarchy. JAX code
raises these eagerly at trace/validation time (the reference validates
eagerly too); inside jitted code, failure is expressed through result
flags (e.g. ``ICPResult.converged``), never exceptions.
"""

from __future__ import annotations


class ThreeCrateError(Exception):
    """Base class for all threecrate-tpu errors."""


class IoError(ThreeCrateError):
    """File / stream I/O failure."""


class InvalidDataError(ThreeCrateError):
    """Input data is malformed (empty cloud, NaNs, wrong shape...)."""


class AlgorithmError(ThreeCrateError):
    """An algorithm could not run or converge given its inputs/config."""


class DeviceError(ThreeCrateError):
    """Accelerator/runtime failure (analog of the reference's Gpu error)."""


class VisualizationError(ThreeCrateError):
    """Viewer / rendering failure."""


class UnsupportedError(ThreeCrateError):
    """Requested operation not supported in this configuration."""


class UnsupportedFormatError(IoError, UnsupportedError):
    """File format/extension has no registered reader or writer."""


def require(cond: bool, message: str, err: type = InvalidDataError) -> None:
    """Eager validation helper; raises ``err(message)`` when cond is false.

    Use only on static (non-traced) values.
    """
    if not cond:
        raise err(message)
