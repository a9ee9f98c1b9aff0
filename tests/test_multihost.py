"""Multi-host path under 2 simulated CPU processes (VERDICT round-1 item 4).

Each subprocess gets 2 virtual CPU devices (4 global), initializes the JAX
distributed runtime over localhost, and runs the SAME
``solve_distributed(..., multihost=True)`` call; the test asserts both
converge with matching histories and a correct (globally assembled)
solution.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", True)

from gmres_tpu.parallel.multihost import initialize
initialize(f"localhost:{port}", num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
import jax.numpy as jnp
from gmres_tpu import GmresConfig, PrecisionSpec
from gmres_tpu.io.rng import rand_vect
from gmres_tpu.io.synth import convection_diffusion_2d
from gmres_tpu.ops.spmv import spmv
from gmres_tpu.parallel.dist_gmres import solve_distributed

A = convection_diffusion_2d(16, beta=1.0)
x_true = rand_vect(A.n_rows, 42)
b = np.asarray(spmv(A, jnp.asarray(x_true)))
cfg = GmresConfig(
    precision=PrecisionSpec.from_mode("mixed"),
    orth="cgsr", precond="jacobi",
    restart_length=12, tol=1e-9, max_restarts=60,
)
res = solve_distributed(A, b, cfg, multihost=True)
assert res.converged, "did not converge"

# per-host partitioning (round-2 VERDICT item 4): this process must have
# materialized only ITS OWN shard blocks — about half the global
# partitioned matrix bytes (2 of 4 shards), not all of them.  The global
# footprint is the f64 outer HaloDIA stack plus its f32 inner copy; the
# slack term covers the Jacobi inv_diag vector (O(n), replicated).
from gmres_tpu.parallel.halo import partition_halo
full = partition_halo(A, 4)
fb = np.asarray(full.data).nbytes
full_matrix_bytes = fb + fb // 2
assert res.partition_local_bytes is not None
assert res.partition_local_bytes <= 0.5 * full_matrix_bytes + A.n_rows * 16 + 4096, (
    res.partition_local_bytes, full_matrix_bytes)
# assemble the global solution on every host for the error check
x_full = np.asarray(jax.jit(
    lambda a: a, out_shardings=jax.sharding.NamedSharding(
        res.x.sharding.mesh, jax.sharding.PartitionSpec())
)(res.x))
err = float(np.linalg.norm(x_full[:A.n_rows] - x_true))
print(f"RESULT {proc_id} converged={res.converged} restarts={res.restarts} "
      f"iters={res.total_iters} err={err:.3e}", flush=True)
assert err < 1e-5, err
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_solve(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.getcwd()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.getcwd(), text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(lines) == 2, outs
    # both processes ran the same lockstep history
    tail0 = lines[0].split(" ", 2)[2]
    tail1 = lines[1].split(" ", 2)[2]
    assert tail0 == tail1, (tail0, tail1)


_WORKER_ROWBLOCK = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
mtx_path = sys.argv[3]
b_path = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", True)

from gmres_tpu.parallel.multihost import initialize
initialize(f"localhost:{port}", num_processes=2, process_id=proc_id)

import numpy as np
import jax.numpy as jnp
from gmres_tpu import GmresConfig, PrecisionSpec
from gmres_tpu.io.loader import load_matrix_rows
from gmres_tpu.io.mmio import read_header
from gmres_tpu.parallel.dist_gmres import AXIS, process_row_range, solve_distributed

n = read_header(mtx_path).n_rows
mesh = jax.make_mesh((jax.device_count(),), (AXIS,))
lo, hi = process_row_range(mesh, n)
# per-host INPUT: this process reads ONLY its row block from disk
blk = load_matrix_rows(mtx_path, lo, hi)
assert blk.row_lo == lo and blk.row_hi == hi
# the block really is a fraction of the global entries (pod-scale memory)
assert blk.col_idx.shape[0] <= 0.75 * blk.nnz, (blk.col_idx.shape[0], blk.nnz)
b = np.load(b_path)

cfg = GmresConfig(
    precision=PrecisionSpec.from_mode("mixed"),
    orth="cgsr", precond="jacobi",
    restart_length=12, tol=1e-9, max_restarts=60,
)
res = solve_distributed(blk, b, cfg, mesh=mesh, multihost=True)
assert res.converged, "did not converge"
x_full = np.asarray(jax.jit(
    lambda a: a, out_shardings=jax.sharding.NamedSharding(
        res.x.sharding.mesh, jax.sharding.PartitionSpec())
)(res.x))
x_true = np.load(b_path.replace("b.npy", "x.npy"))
err = float(np.linalg.norm(x_full[:n] - x_true))
print(f"RESULT {proc_id} converged={res.converged} restarts={res.restarts} "
      f"iters={res.total_iters} err={err:.3e}", flush=True)
assert err < 1e-5, err
"""


def test_two_process_rowblock_input(tmp_path):
    """Pod-scale per-host INPUT (SURVEY.md §5.8): each process loads only
    its row block from the .mtx; the solve matches across processes."""
    import numpy as np

    import jax.numpy as jnp

    from gmres_tpu.io import mmio
    from gmres_tpu.io.loader import load_matrix
    from gmres_tpu.io.rng import rand_vect
    from gmres_tpu.io.synth import convection_diffusion_2d
    from gmres_tpu.ops.spmv import spmv

    A = convection_diffusion_2d(16, beta=1.0)
    rp = np.asarray(A.row_ptr).astype(np.int64)
    nnz = int(rp[-1])
    rows = np.repeat(np.arange(A.n_rows), np.diff(rp))
    mtx = tmp_path / "a.mtx"
    mmio.write_coordinate(
        mtx, A.n_rows, A.n_cols,
        rows, np.asarray(A.col_idx)[:nnz], np.asarray(A.vals)[:nnz],
    )
    # the .mtx round-trips to the same assembled matrix
    A2 = load_matrix(mtx)
    np.testing.assert_allclose(A2.to_dense(), A.to_dense(), atol=0)

    x_true = rand_vect(A.n_rows, 42)
    b = np.asarray(spmv(A2, jnp.asarray(x_true)))
    np.save(tmp_path / "b.npy", b)
    np.save(tmp_path / "x.npy", x_true)

    port = _free_port()
    script = tmp_path / "worker_rb.py"
    script.write_text(_WORKER_ROWBLOCK)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.getcwd()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(mtx),
             str(tmp_path / "b.npy")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.getcwd(), text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("rowblock multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(lines) == 2, outs
    assert lines[0].split(" ", 2)[2] == lines[1].split(" ", 2)[2]
