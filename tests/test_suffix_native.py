"""Native SA-IS vs the NumPy prefix-doubling oracle."""
import numpy as np
import pytest

from mapcaller_tpu.index.suffix import (_build_suffix_array_native,
                                        _build_suffix_array_numpy)


@pytest.mark.parametrize("n", [2, 3, 17, 256, 4097, 100_000])
def test_native_sa_matches_oracle(n, rng):
    t = rng.integers(0, 4, size=n).astype(np.uint8)
    assert np.array_equal(_build_suffix_array_native(t),
                          _build_suffix_array_numpy(t))


def test_native_sa_repetitive(rng):
    # repetitive text stresses the LMS-naming recursion
    unit = rng.integers(0, 4, size=7).astype(np.uint8)
    t = np.tile(unit, 2000)
    assert np.array_equal(_build_suffix_array_native(t),
                          _build_suffix_array_numpy(t))
    t2 = np.zeros(5000, dtype=np.uint8)  # single-symbol text
    assert np.array_equal(_build_suffix_array_native(t2),
                          _build_suffix_array_numpy(t2))
