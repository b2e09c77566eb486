"""Bit-exact parity of the batched JAX RS decoder vs the golden oracle."""

import numpy as np
import pytest

from viterbi_tpu import constants as C
from viterbi_tpu import golden


def _random_codewords(rng, n, errs):
    """n codewords, errs[i] random byte errors injected in codeword i."""
    msgs = rng.integers(0, 256, (n, C.RS_KK), dtype=np.uint8)
    cws = np.stack([golden.rs_encode_codeword(m) for m in msgs]).astype(np.int64)
    for i, e in enumerate(errs):
        if e:
            pos = rng.choice(C.RS_N, e, replace=False)
            cws[i, pos] ^= rng.integers(1, 256, e)
    return msgs, cws


def test_rs_batch_matches_golden_mixed_errors():
    from viterbi_tpu.ops import rs
    import jax.numpy as jnp
    rng = np.random.default_rng(42)
    errs = [0, 1, 2, 3, 4, 5, 6, 8, 0, 5, 1, 7]  # incl. uncorrectable
    msgs, cws = _random_codewords(rng, len(errs), errs)
    count, corrected = rs.rs_decode_blocks(jnp.asarray(cws))
    count, corrected = np.asarray(count), np.asarray(corrected)
    for i in range(len(errs)):
        g_count, g_corr = golden.rs_decode_codeword(cws[i])
        assert count[i] == g_count, f"cw {i}: {count[i]} vs {g_count}"
        assert np.array_equal(corrected[i], g_corr), f"cw {i} data"


def test_rs_batch_random_fuzz():
    from viterbi_tpu.ops import rs
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    # fully random blocks (mostly uncorrectable) must agree too
    cws = rng.integers(0, 256, (16, C.RS_N)).astype(np.int64)
    count, corrected = rs.rs_decode_blocks(jnp.asarray(cws))
    count, corrected = np.asarray(count), np.asarray(corrected)
    for i in range(16):
        g_count, g_corr = golden.rs_decode_codeword(cws[i])
        assert count[i] == g_count, f"cw {i}"
        assert np.array_equal(corrected[i], g_corr), f"cw {i} data"


def test_rs_superframe_api_matches_golden():
    from viterbi_tpu.ops import rs
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    rs_dims = 6
    msgs, cws = _random_codewords(rng, rs_dims, [0, 2, 0, 5, 1, 0])
    interleaved = cws.T.reshape(-1).astype(np.uint8)
    errors, out = rs.rs_check_superframe(jnp.asarray(interleaved), rs_dims)
    g_errors, g_out = golden.rs_check_superframe(interleaved, rs_dims)
    assert int(errors) == g_errors == 8
    assert np.array_equal(np.asarray(out), g_out)
    out2 = np.asarray(out).reshape(C.RS_KK, rs_dims).T
    assert np.array_equal(out2, msgs)


def test_rs_superframe_uncorrectable_aborts():
    from viterbi_tpu.ops import rs
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    rs_dims = 4
    msgs, cws = _random_codewords(rng, rs_dims, [1, 9, 0, 2])
    interleaved = cws.T.reshape(-1).astype(np.uint8)
    errors, out = rs.rs_check_superframe(jnp.asarray(interleaved), rs_dims)
    assert int(errors) == -1
    out2 = np.asarray(out).reshape(C.RS_KK, rs_dims).T
    # codeword 0 decoded before the failure; 1.. zeroed
    assert np.array_equal(out2[0], msgs[0])
    assert not out2[1].any() and not out2[2].any() and not out2[3].any()
