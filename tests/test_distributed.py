"""Multi-host (DCN) initialization smoke test: 2 CPU processes.

Exercises `parallel/distributed.py` for real: two subprocesses join a
jax.distributed cluster over a localhost coordinator, build the global
mesh spanning both processes' devices, and run ONE jitted cross-process
reduction — the minimal DCN analog of the pod-scale launch recipe
(SURVEY.md §2.10):

    # per host
    distributed.initialize(coordinator_address="<host0>:<port>",
                           num_processes=N, process_id=i)
    mesh = make_mesh()           # spans all processes' devices
    ... engine='sharded' / sharded_bisection_solve over that mesh ...

Skips (with this recipe) only if the jaxlib in the image cannot start the
distributed runtime on CPU; any numerical mismatch is a hard failure.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # exactly one local CPU device
    sys.path.insert(0, sys.argv[3])
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from copula_var_tpu.parallel import distributed, make_mesh
    try:
        distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid,
        )
    except Exception as e:  # runtime unavailable in this image
        print("INIT_FAILED", type(e).__name__, e, flush=True)
        sys.exit(3)
    info = distributed.process_info()
    assert info["process_count"] == 2, info
    assert info["global_device_count"] == 2, info
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("days"))
    data = np.array([1.5, 2.5])
    arr = jax.make_array_from_callback((2,), sharding, lambda idx: data[idx])
    # jnp.sum over a cross-process-sharded array -> XLA inserts the
    # cross-host all-reduce (the DCN collective path)
    out = jax.jit(jnp.sum)(arr)
    print("RESULT", float(out), flush=True)

    # the PRODUCTION day-sharded bisection across both processes: T=4
    # days, 2 per host; the while_loop's convergence reduction rides the
    # cross-process collective. Each process checks its local shards
    # against a single-process f64 reference computed independently.
    from copula_var_tpu.ops.grids import garch_grid
    from copula_var_tpu.ops.quadrature import (
        CopulaSpec, garch_day_tensors, garch_integrals_cached,
    )
    from copula_var_tpu.parallel import sharded_bisection_solve
    rng = np.random.default_rng(0)
    T, n = 4, 24
    x, dx = garch_grid(n)
    fv = rng.uniform(0.7, 1.4, size=(T, 2))
    corr = np.array([[1.0, 0.45], [0.45, 1.0]])
    spec = CopulaSpec("gaussian", (jnp.asarray(corr),))
    w = np.array([0.5, 0.5])
    V = garch_day_tensors(fv, x, spec)
    entry_up = rng.uniform(-3.0, -1.0, size=T)
    prev = np.asarray(garch_integrals_cached(
        np.column_stack([np.full(T, -100.0), entry_up]), V, x, dx, w))
    roots = sharded_bisection_solve(
        mesh, V, None, None, x, dx, w,
        np.full(T, -7.5), np.full(T, 0.0), prev, entry_up,
        np.ones(T, dtype=bool), 0.05, 1e-6,
    )
    local = {int(s.index[0].start if s.index[0].start else 0): np.asarray(s.data)
             for s in roots.addressable_shards}
    # single-process reference bisection (host loop, same math)
    lo, up = np.full(T, -7.5), np.full(T, 0.0)
    pr, pu, us = prev.copy(), entry_up.copy(), np.ones(T, dtype=bool)
    while np.any(up - lo > 1e-6):
        mid = 0.5 * (lo + up)
        b = np.where(us[:, None], np.column_stack([lo, mid]),
                     np.column_stack([mid, up]))
        mres = np.asarray(garch_integrals_cached(b, V, x, dx, w))
        res = np.where(b[:, 0] == pu, pr + mres, pr - mres)
        us = res < 0.05
        lo = np.where(us, mid, lo)
        up = np.where(us, up, mid)
        pr, pu = res, mid
    want = 0.5 * (lo + up)
    for start, vals in local.items():
        assert np.allclose(vals, want[start:start + len(vals)], atol=1e-6), (
            start, vals, want)
    print("SOLVE_OK", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i), REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out))
    if any(rc == 3 for rc, _ in outs):
        pytest.skip(
            "jax.distributed runtime unavailable on CPU in this image; "
            "launch recipe documented in this test's docstring. Worker "
            f"output: {outs}"
        )
    for rc, out in outs:
        assert rc == 0, out
        assert "RESULT 4.0" in out, out
        assert "SOLVE_OK" in out, out
