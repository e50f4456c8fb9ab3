"""Parameters validation and derived-field parity (reference model/mod.rs:33-81)."""

import pytest

from redux_tpu.errors import InvalidInputError
from redux_tpu.params import Parameters


def test_derived_fields_default():
    # Reference CLI production config (main.rs:108).
    p = Parameters(8, 30, 32)
    assert p.symbol_eof == 256
    assert p.symbol_count == 257
    assert p.freq_max == (1 << 30) - 1
    assert p.code_min == 0
    assert p.code_one_fourth == 1 << 30
    assert p.code_half == 2 << 30
    assert p.code_three_fourths == 3 << 30
    assert p.code_max == (1 << 32) - 1
    assert not p.fits_u32


def test_derived_fields_doc_example():
    # Doc-example config (lib.rs:31).
    p = Parameters(8, 14, 16)
    assert p.symbol_eof == 256
    assert p.freq_max == 16383
    assert p.code_half == 1 << 15
    assert p.code_max == (1 << 16) - 1
    assert p.fits_u32


@pytest.mark.parametrize(
    "s,f,c",
    [
        (0, 14, 16),  # symbol < 1
        (8, 9, 16),  # freq < symbol + 2
        (8, 14, 15),  # code < freq + 2
        (8, 33, 35),  # code + freq > 64
        (16, 32, 34),  # code + freq > 64
    ],
)
def test_invalid_parameters(s, f, c):
    # Validation invariant (model/mod.rs:64).
    with pytest.raises(InvalidInputError):
        Parameters(s, f, c)


@pytest.mark.parametrize(
    "s,f,c",
    [(4, 10, 16), (4, 14, 16), (4, 22, 24), (4, 24, 30), (4, 30, 32),
     (8, 10, 16), (8, 14, 16), (8, 22, 24), (8, 24, 30), (8, 30, 32),
     (12, 14, 16), (12, 22, 24), (12, 24, 30), (12, 30, 32),
     (8, 15, 17), (1, 3, 5), (8, 26, 38), (20, 22, 24)],
)
def test_valid_parameter_grid(s, f, c):
    # The reference differential-test grid (model/tests.rs:95-251) plus
    # boundary configs are all accepted.
    p = Parameters(s, f, c)
    assert p.symbol_count == (1 << s) + 1
    assert p.fits_u32 == (f + c <= 32)


def test_tpu32_config():
    p = Parameters.tpu32()
    assert p.fits_u32


def test_parameters_frozen():
    p = Parameters.default()
    with pytest.raises(Exception):
        p.symbol_bits = 4  # type: ignore[misc]
