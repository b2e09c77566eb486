"""Distributed-runtime init (parallel.distributed) and the multi-device
scaling sweep (harness.scaling) — the SURVEY §2.7 "distributed
communication backend" slot and the BASELINE ≥85% efficiency artifact.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def test_initialize_single_process_is_noop(monkeypatch):
    """No explicit coordinator and no cluster env: initialize() must
    return False without touching the distributed runtime (a silent
    auto-init attempt would raise in this environment)."""
    from viterbi_tpu.parallel import distributed
    for k in distributed._CLUSTER_ENV:
        monkeypatch.delenv(k, raising=False)
    assert distributed.initialize() is False


def test_initialize_error_propagates(monkeypatch):
    """A misconfigured explicit coordinator must raise, not silently
    degrade to single-process decoding (the round-1 code swallowed the
    error). The runtime client is monkeypatched — the real gRPC client
    blocks unboundedly on a dead coordinator, so it can't be exercised
    hermetically in-process."""
    import jax

    from viterbi_tpu.parallel import distributed

    monkeypatch.setattr(distributed, "_initialized", False)

    def boom(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        distributed.initialize("127.0.0.1:1", num_processes=2, process_id=0)


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from viterbi_tpu.parallel import distributed
    ok = distributed.initialize(
        coordinator_address=sys.argv[1],
        num_processes=2, process_id=int(sys.argv[2]))
    assert ok, "distributed mode not active"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * len(jax.local_devices())
    sl = distributed.local_batch_slice(8)
    assert sl == slice(4 * jax.process_index(), 4 * jax.process_index() + 4)

    # real decode work on the local DP shard (both workers build the
    # same global batch; each decodes its slice and verifies)
    import numpy as np
    import jax.numpy as jnp
    from viterbi_tpu import golden
    from viterbi_tpu.ops import acs, traceback
    framebits = 96
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (8, framebits), dtype=np.uint8)
    syms = np.stack([golden.hard_to_soft(golden.encode(b)) for b in bits])
    dec, _ = acs.forward(jnp.asarray(syms[sl].astype(np.int32)),
                         framebits + 6)
    out = np.asarray(traceback.chainback_blocked(dec, framebits, block=8))
    assert (out == np.packbits(bits[sl], axis=1)).all(), "local decode wrong"

    # a collective that actually crosses the process boundary
    total = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((len(jax.local_devices()),)))
    assert int(total[0]) == len(jax.devices()), total
    print("WORKER_OK", jax.process_index())
""")


@pytest.mark.slow
def test_two_process_cpu_smoke(tmp_path):
    """Two real processes join one JAX runtime over a localhost
    coordinator (CPU backend) — the wiring a pod-slice launch uses."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo_root = os.path.dirname(os.path.dirname(__file__))
    # -S skips site initialization: this machine's sitecustomize
    # pre-imports jax and runs a computation, which would make
    # jax.distributed.initialize() impossible in the worker.
    import sysconfig
    pypath = os.pathsep.join(
        [repo_root, sysconfig.get_paths()["purelib"]]
        + [p for p in (os.environ.get("PYTHONPATH") or "").split(os.pathsep)
           if p])
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=pypath)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [subprocess.Popen(
        [sys.executable, "-S", str(script), addr, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, cwd=repo_root)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode())
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out


def test_scaling_sweep_runs_and_is_sane():
    """The scaling sweep (BASELINE config 5) must run on the virtual
    8-device mesh and report sane efficiencies; the recorded artifact
    is SCALING_r02.json."""
    from viterbi_tpu.harness import scaling
    results = scaling.sweep(frames_per_device=4, framebits=192, loops=2)
    assert set(results) == {1, 2, 4, 8}
    assert results[1]["efficiency"] == 1.0
    for n, r in results.items():
        assert r["mbit_s"] > 0
        assert 0.05 < r["efficiency"] <= 1.5, (n, r)
