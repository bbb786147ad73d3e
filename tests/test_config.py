"""Config/param-resolution semantics: F7 err-filter CLI arithmetic and the
params-compatibility guard (G4)."""
import pytest

from finchspark.config import check_compatibility, resolve_err_filter
from finchspark.kernels import SketchParams


def test_err_filter_cli_scaling_golden():
    # reference arithmetic (`cli/src/cli.rs:264-265`): pct * k / 100
    assert resolve_err_filter(1.0, 21) == pytest.approx(0.21)
    assert resolve_err_filter(1.0, 31) == pytest.approx(0.31)
    assert resolve_err_filter(0.0, 21) == 0.0
    # upper bound is 100/k -> resolved value 1.0 exactly
    assert resolve_err_filter(100.0 / 21.0, 21) == pytest.approx(1.0)


def test_err_filter_bounds_rejected():
    # `get_float_arg` validates [0, 100/k] (`cli/src/cli.rs:226-239`)
    with pytest.raises(ValueError):
        resolve_err_filter(-0.1, 21)
    with pytest.raises(ValueError):
        resolve_err_filter(100.0 / 21.0 + 1e-9, 21)


def test_compatibility_guard():
    a = SketchParams(kmer_length=21)
    b = SketchParams(kmer_length=31)
    with pytest.raises(ValueError):
        check_compatibility(a, b)
