"""Hand-derived MULTI-SYMBOL adaptive vectors (implementation-independent).

Round-4 verdict: the long-stream golden fixtures were produced by our own
C++ port, so end-to-end format equivalence was partially self-referential
— the only implementation-independent anchors were the transcribed bitio
vectors and two one-symbol streams.  A wrong shared assumption about the
EOF extra drain (codec.rs:91-99), the decoder's mid-descent update
ordering (adaptive_tree.rs:110,133), or the freeze gate
(adaptive_linear.rs:33-38) could have passed every test.  The two vectors
below close that: worked out step by step from the reference's integer
arithmetic (codec.rs:55-158, adaptive_linear.rs:26-58, MSB-first bitio),
they drive MULTI-symbol adaptation, the decoder's priming + E2 descent,
and (vector B) the freeze gate INCLUDING the count overshoot past
freq_max, across every coder implementation in this repo.

== Vector A: reference-format stream, Parameters(4, 10, 16) ==

Input byte 0x21 read as 4-bit symbols (compress_stream, MSB-first):
[2, 1], then EOF = 16.  Initial model freq[i] = i (i in 0..17), count
= freq[17] = 17; after coding s the model adds +1 to freq[i > s]
(adaptive_linear.rs:33-38; freq_max = 1023 so never frozen here).
Narrowing per codec.rs:58-60 (range = high - low + 1; high' = low +
range*fhi//count - 1; low' = low + range*flo//count), then E1/E2/E3
renormalization (codec.rs:62-89):

  sym=2  count=17 (flo,fhi)=(2,3):   narrow [0,65535] -> [7710,11564]
  sym=1  count=18 (flo,fhi)=(1,2):   (renormed) -> [30625,32337]
  sym=16 count=19 (flo,fhi)=(18,19): (renormed) -> [57213,58655]
         EOF drain (codec.rs:91-99) emits code_bits - consumed bits of low.

  Stream: 0x1F 0xBE 0xFA (24 bits incl. zero flush pad).

Decoder twin (codec.rs:124-158): priming reads code_bits = 16 bits ->
pending = 0x1FBE = 8126; value = ((pending - low + 1)*count - 1)//range:

  step 0: value = (8126+1)*17 - 1 = 138158; //65536 = 2  -> sym 2
  step 1: pending 32247, value 1                         -> sym 1
  step 2: pending 57213, value = ((57213-30625+1)*19-1)//1713 = 18
          freq[16] = 18 <= 18 < 19 = freq[17]            -> sym 16 = EOF

step 1's descent takes the E2 branch (low 30625 >= half = 32768 after
doubling; pending -= half) — the priming + E2 path of codec.rs:140-158.

== Vector B: v2 block payload, Parameters(8, 10, 12), delta = 255 ==

Input b"ABCDE" (symbols 65..69), uniform init cum[i] = i, count 257,
freq_max = 1023, adaptation +255 above the symbol while count <
freq_max (the container's delta generalization of adaptive_linear's +1).
Totals after each symbol: 512, 767, 1022, then 1022 < 1023 so symbol 68
STILL updates -> 1277, OVERSHOOTING freq_max (the freeze-overshoot
behavior tests/test_freeze_overshoot.py pins differentially — here
pinned implementation-independently); symbol 69 codes frozen at count
1277 with (flo,fhi) = (1089,1090) = (69,70) + 4*255.

  sym=65 count=257  (65,66)     narrow -> [1035,1050]
  sym=66 count=512  (321,322)   (renormed) -> [2692,2695]
  sym=67 count=767  (577,578)   -> [3081,3085]
  sym=68 count=1022 (833,834)   -> [2598,2600]
  sym=69 count=1277 (1089,1090) -> [2619,2621]
  2-bit v2 terminator: tq = ceil(low/quarter) = 1 -> bits 0,1.

  Payload: 0x41 0x50 0xE0 0x68 0xA2 0x3B (6 bytes).

Decoder twin (codec.rs:124-158, zero bits past the payload end — the
v2 read contract): priming reads code_bits = 12 bits; per step
value = ((pending - low + 1)*count - 1)//range against the SAME
adapting model, reproducing the count/interval table above exactly:

  step 0: count=257  value=65   -> sym 65 'A'   [1035,1050]
  step 1: count=512  value=321  -> sym 66 'B'   [2692,2695]
  step 2: count=767  value=577  -> sym 67 'C'   [3081,3085]
  step 3: count=1022 value=833  -> sym 68 'D'   [2598,2600]
  step 4: count=1277 value=1089 -> sym 69 'E'   [2619,2621]

step 4 decodes against the OVERSHOT frozen count 1277 > freq_max —
any implementation that clamps the count at freq_max instead of
letting it overshoot fails this vector on both directions.
"""

import numpy as np
import pytest

from redux_tpu import oracle
from redux_tpu.models.dense import DenseModel, uniform_init_cum
from redux_tpu.models.fenwick import AdaptiveFenwickModel
from redux_tpu.models.linear import AdaptiveLinearModel
from redux_tpu.params import Parameters

INPUT_A = b"\x21"
PARAMS_A = Parameters(4, 10, 16)
EXPECTED_A = bytes.fromhex("1fbefa")

INPUT_B = b"ABCDE"
PARAMS_B = Parameters(8, 10, 12)
DELTA_B = 255
EXPECTED_B = bytes.fromhex("4150e068a23b")


@pytest.mark.parametrize(
    "model_cls", [AdaptiveLinearModel, AdaptiveFenwickModel, DenseModel]
)
def test_vector_a_models_match_derivation(model_cls):
    assert oracle.compress_bytes(INPUT_A, model_cls(PARAMS_A)) == EXPECTED_A


def test_vector_a_native_matches_derivation():
    native = pytest.importorskip("redux_tpu.native")
    assert native.compress_bytes(INPUT_A, PARAMS_A) == EXPECTED_A


@pytest.mark.parametrize(
    "model_cls", [AdaptiveLinearModel, AdaptiveFenwickModel, DenseModel]
)
def test_vector_a_decodes(model_cls):
    assert oracle.decompress_bytes(EXPECTED_A, model_cls(PARAMS_A)) == INPUT_A


def test_vector_a_native_decodes():
    native = pytest.importorskip("redux_tpu.native")
    assert native.decompress_bytes(EXPECTED_A, PARAMS_A) == INPUT_A


def test_vector_b_oracle_matches_derivation():
    ic = uniform_init_cum(PARAMS_B).astype(np.int64)
    assert oracle.compress_block(INPUT_B, PARAMS_B, ic, DELTA_B) == EXPECTED_B
    assert (
        oracle.decompress_block(EXPECTED_B, len(INPUT_B), PARAMS_B, ic, DELTA_B)
        == INPUT_B
    )


def test_vector_b_native_matches_derivation():
    native = pytest.importorskip("redux_tpu.native")
    assert native.compress_block_v2(INPUT_B, PARAMS_B, None, DELTA_B) == EXPECTED_B
    assert (
        native.decompress_block_v2(EXPECTED_B, len(INPUT_B), PARAMS_B, None, DELTA_B)
        == INPUT_B
    )


def test_vector_b_xla_coder_matches_derivation():
    import jax.numpy as jnp

    from redux_tpu.ops.coder import decode_blocks, encode_blocks_v2
    from redux_tpu.ops.ranks import precompute_encode_model

    ic = uniform_init_cum(PARAMS_B).astype(np.int32)
    syms = jnp.asarray(np.frombuffer(INPUT_B, np.uint8)[None, :].astype(np.int32))
    lens = jnp.asarray(np.array([len(INPUT_B)], np.int32))
    lo, hi, tot, _, _, _ = precompute_encode_model(
        syms, lens, jnp.asarray(ic), PARAMS_B.freq_max, delta=DELTA_B
    )
    words, blens, ovf = encode_blocks_v2(lo, hi, tot, lens, PARAMS_B, 8)
    assert not bool(np.asarray(ovf).any())
    got = np.asarray(words)[0].astype(">u4").tobytes()[: int(np.asarray(blens)[0])]
    assert got == EXPECTED_B
    wpad = np.zeros((1, 8), np.uint32)
    wpad[0, :2] = np.frombuffer(EXPECTED_B + b"\0\0", ">u4")
    dec = np.asarray(
        decode_blocks(
            jnp.asarray(wpad), lens, jnp.asarray(ic), PARAMS_B,
            len(INPUT_B), delta=DELTA_B,
        )
    )
    assert bytes(dec[0, : len(INPUT_B)].astype(np.uint8)) == INPUT_B


def test_vector_b_pallas_kernels_match_derivation(monkeypatch):
    """Both Pallas coder families, on the production TWO-LEVEL sweep."""
    import jax.numpy as jnp

    from redux_tpu.ops.pallas_decode import decode_blocks_pallas
    from redux_tpu.ops.pallas_encode import encode_blocks_pallas_m

    monkeypatch.setenv("REDUX_TPU_DECODE_SWEEP", "bucket")
    ic = uniform_init_cum(PARAMS_B).astype(np.int32)
    syms = jnp.asarray(np.frombuffer(INPUT_B, np.uint8)[None, :].astype(np.int32))
    lens = jnp.asarray(np.array([len(INPUT_B)], np.int32))
    words, blens, ovf = encode_blocks_pallas_m(
        syms, lens, jnp.asarray(ic), PARAMS_B, 8, DELTA_B
    )
    got = np.asarray(words)[0].astype(">u4").tobytes()[: int(np.asarray(blens)[0])]
    assert got == EXPECTED_B
    wpad = np.zeros((1, 8), np.uint32)
    wpad[0, :2] = np.frombuffer(EXPECTED_B + b"\0\0", ">u4")
    dec = np.asarray(
        decode_blocks_pallas(
            jnp.asarray(wpad), lens, jnp.asarray(ic), PARAMS_B,
            len(INPUT_B), DELTA_B,
        )
    )
    assert bytes(dec[0, : len(INPUT_B)]) == INPUT_B


def test_vector_b_model_values_kernel_matches_derivation(monkeypatch):
    """The encode model-values kernel (production TPU encode path) on the
    two-level sweep reproduces the hand-derived (flo, fhi) table,
    including the frozen overshot count step."""
    from redux_tpu.ops.pallas_model import model_lohi_pallas

    monkeypatch.setenv("REDUX_TPU_MODEL_SWEEP", "bucket")
    ic = uniform_init_cum(PARAMS_B).astype(np.int32)
    syms = np.frombuffer(INPUT_B, np.uint8)[None, :].astype(np.int32)
    lens = np.array([len(INPUT_B)], np.int32)
    import jax.numpy as jnp

    lo, hi = model_lohi_pallas(
        jnp.asarray(syms), jnp.asarray(lens), jnp.asarray(ic), PARAMS_B,
        DELTA_B,
    )
    # The hand derivation's (flo, fhi) per symbol (docstring table).
    np.testing.assert_array_equal(
        np.asarray(lo)[0, :5], [65, 321, 577, 833, 1089]
    )
    np.testing.assert_array_equal(
        np.asarray(hi)[0, :5], [66, 322, 578, 834, 1090]
    )
