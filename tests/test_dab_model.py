"""End-to-end DAB+ audio superframe pipeline: deconvolve -> RS chain."""

import numpy as np

from viterbi_tpu import constants as C
from viterbi_tpu import golden
from viterbi_tpu.harness import channel
from viterbi_tpu.models import dab


def _make_superframe_fixture(rng, bitrate=32, corrupt_bytes=0):
    cfg = dab.SubchannelConfig(bitrate)
    audio = rng.integers(0, 256, (cfg.rs_dims, C.RS_KK), dtype=np.uint8)
    cws = np.stack([golden.rs_encode_codeword(m) for m in audio])
    sf = cws.T.reshape(-1).astype(np.int64)          # interleaved 120*rs_dims
    if corrupt_bytes:
        pos = rng.choice(sf.size, corrupt_bytes, replace=False)
        sf[pos] ^= rng.integers(1, 256, corrupt_bytes)
    frames = np.unpackbits(sf.astype(np.uint8)).reshape(
        dab.SUPERFRAME_FRAMES, cfg.framebits)
    syms = np.stack([
        channel.awgn_soft_symbols(golden.encode(f), rng, ebn0_db=7.0)
        for f in frames])
    return cfg, audio, syms.astype(np.int32)


def test_superframe_pipeline_clean():
    rng = np.random.default_rng(0)
    cfg, audio, syms = _make_superframe_fixture(rng)
    out, errors = dab.decode_audio_superframes(syms[None], cfg.bitrate_kbps)
    out, errors = np.asarray(out), np.asarray(errors)
    assert errors[0] >= 0  # correctable (high SNR; RS mops up residue)
    got = out[0].reshape(C.RS_KK, cfg.rs_dims).T
    assert np.array_equal(got, audio)


def test_superframe_pipeline_with_byte_errors():
    rng = np.random.default_rng(1)
    # corrupt 2 bytes pre-encoding: the viterbi stage reproduces them and
    # RS corrects them (counted in errors)
    cfg, audio, syms = _make_superframe_fixture(rng, corrupt_bytes=2)
    out, errors = dab.decode_audio_superframes(syms[None], cfg.bitrate_kbps)
    out, errors = np.asarray(out), np.asarray(errors)
    assert errors[0] >= 2
    got = out[0].reshape(C.RS_KK, cfg.rs_dims).T
    assert np.array_equal(got, audio)


def test_superframe_batch_and_geometry():
    cfg = dab.SubchannelConfig(32)
    assert cfg.framebits == 768 and cfg.rs_dims == 4
    rng = np.random.default_rng(2)
    fixtures = [_make_superframe_fixture(rng) for _ in range(3)]
    syms = np.stack([f[2] for f in fixtures])
    out, errors = dab.decode_audio_superframes(syms, 32)
    out = np.asarray(out)
    for i, (cfg_i, audio, _) in enumerate(fixtures):
        got = out[i].reshape(C.RS_KK, cfg.rs_dims).T
        assert np.array_equal(got, audio), f"superframe {i}"


def test_superframe_ensemble_sharded_matches_unsharded():
    """The one-call sharded DAB+ chain (VERDICT r4 next #3) on the
    8-device mesh must equal the single-device pipeline exactly."""
    import jax
    rng = np.random.default_rng(8)
    fixtures = [_make_superframe_fixture(rng,
                                         corrupt_bytes=(i % 3))
                for i in range(8)]
    syms = np.stack([f[2] for f in fixtures])
    from viterbi_tpu.parallel import mesh as mesh_mod
    mesh = mesh_mod.make_mesh(n_data=8, n_seq=1)
    audio_s, errs_s = dab.decode_ensemble_sharded(syms, 32, mesh)
    audio_u, errs_u = dab.decode_audio_superframes(
        np.asarray(syms, dtype=np.int32), 32)
    assert np.array_equal(np.asarray(audio_s), np.asarray(audio_u))
    assert np.array_equal(np.asarray(errs_s), np.asarray(errs_u))
    for i, (cfg, audio, _) in enumerate(fixtures):
        got = np.asarray(audio_s)[i].reshape(C.RS_KK, cfg.rs_dims).T
        assert np.array_equal(got, audio), i   # all fixtures correctable
