#!/usr/bin/env python
"""Multi-host (DCN-analog) dry run: a 2-process `jax.distributed` runtime on
CPU, each process contributing 4 virtual devices to one 8-device global mesh
(SURVEY.md section 2.4 distributed-backend row: collectives ride ICI within
a slice and DCN across slices — this validates the multi-PROCESS runtime
path that single-process dryruns cannot).

Asserts PIPELINE-level equivalence (VERDICT r3 item 7): the production
scoring graph (pipeline/scoring.score_cells — CAE forward -> recon errors ->
scaler -> PCA -> 2x RBF-SVM -> ensemble vote -> FFT detector) runs with the
cell batch sharded over the cross-process global mesh, anomaly COUNTS
reduced by XLA collectives across both processes, and the result must equal
the single-process local run bit-for-bit (integer counts).  A minimal psum
masked-count check runs first so a collective-transport failure is
distinguishable from a pipeline-graph failure.

Usage:
  python scripts/dryrun_dcn.py            # launcher: spawns 2 workers
  python scripts/dryrun_dcn.py WORKER I PORT  # internal worker entry
"""
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROC = 2
LOCAL_DEVICES = 4


def worker(proc_id: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == N_PROC
    devs = jax.devices()
    assert len(devs) == N_PROC * LOCAL_DEVICES, len(devs)
    mesh = Mesh(np.array(devs), ("data",))
    shard = NamedSharding(mesh, P("data"))

    # deterministic global batch; each process materializes its local shard
    n = 64
    rng = np.random.default_rng(7)
    scores = rng.normal(size=(n,)).astype(np.float32)
    valid = rng.uniform(size=(n,)) > 0.25
    flags = (scores > 0.5) & valid

    per = n // (N_PROC * LOCAL_DEVICES)
    lo = proc_id * LOCAL_DEVICES * per
    local = np.stack([flags, valid], axis=1).astype(np.float32)[
        lo: lo + LOCAL_DEVICES * per
    ]
    garr = jax.make_array_from_process_local_data(shard, local, (n, 2))

    @jax.jit
    def counts(x):
        # anomaly/valid counts, reduced across the full (cross-process) mesh
        # (integer-exact: the rate division stays on the host, matching the
        # production scoring path's host-side rate computation)
        return jnp.sum(x[:, 0].astype(jnp.int32)), jnp.sum(x[:, 1].astype(jnp.int32))

    ga, gv = (int(v) for v in counts(garr))
    want = (int(flags.sum()), int(valid.sum()))
    assert (ga, gv) == want, ((ga, gv), want)
    got = ga / max(gv, 1)

    # --- pipeline-level equivalence: score_cells under the global mesh -----
    # Both processes deterministically build identical scoring artifacts and
    # the identical global cell batch; the batch is then sharded over the
    # cross-process mesh and the anomaly counts reduced by XLA collectives.
    from functools import partial

    from __graft_entry__ import _build_scoring
    from cell_image_analysis_tpu.pipeline.scoring import score_cells

    n_cells = 64
    model, params, cells = _build_scoring(batch=n_cells, n_train=32, seed=0)

    @partial(jax.jit, static_argnames=("m",))
    def anomaly_counts(m, p, X):
        s = score_cells(m, p, X)
        return tuple(
            jnp.sum((pred == -1).astype(jnp.int32))
            for pred in (s.conservative_predictions, s.moderate_predictions,
                         s.ensemble_predictions, s.fft_predictions)
        )

    # single-process local reference (process-local arrays, local devices)
    ref_counts = tuple(int(v) for v in anomaly_counts(
        model, params, jnp.asarray(cells)))

    # global run: params replicated, cells 'data'-sharded across processes
    repl = NamedSharding(mesh, P())
    params_g = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            repl, np.asarray(a), np.shape(a)),
        params,
    )
    per_cells = n_cells // (N_PROC * LOCAL_DEVICES)
    clo = proc_id * LOCAL_DEVICES * per_cells
    cells_local = cells[clo: clo + LOCAL_DEVICES * per_cells]
    cells_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None, None, None)), cells_local,
        cells.shape,
    )
    got_counts = tuple(int(v) for v in anomaly_counts(model, params_g, cells_g))
    assert got_counts == ref_counts, (got_counts, ref_counts)

    # --- fused-pipeline equivalence: score_frames_fused under the global
    # mesh (VERDICT r4 item 7).  Stage A (threshold -> run-table CC ->
    # regionprops/QC -> crop/CLAHE/resize) + the scoring chain run as ONE
    # graph with the FRAME batch sharded across both processes — this is
    # what a real v5e-8 multi-host screening run dispatches.  The device
    # buffer is non-addressable cross-process, so the decode half runs on a
    # process_allgather'ed copy instead of the single-process np fetch.
    from jax.experimental import multihost_utils

    from cell_image_analysis_tpu.models.segmentation import threshold_segment
    from cell_image_analysis_tpu.pipeline.scoring import (
        score_frames_fused,
        score_frames_fused_start,
        score_frames_fused_wait,
    )
    from cell_image_analysis_tpu.utils.bench import _threshold_mask_fn
    from cell_image_analysis_tpu.utils.synthetic import make_frame as _mf

    n_frames = N_PROC * LOCAL_DEVICES
    frng = np.random.default_rng(2)
    fr = np.stack([_mf(frng, size=128, n_cells=4) for _ in range(n_frames)])
    segs = jnp.asarray(fr[..., 2].astype(np.float32))
    greens = jnp.asarray(fr[..., 1].astype(np.float32))
    fused_kw = dict(chunk=8, cell_capacity=16, label_capacity=64)

    # single-process local reference (identical on both processes)
    ref_sc, ref_stats = score_frames_fused(
        model, params, segs, greens, _threshold_mask_fn,
        fallback_segment_fn=threshold_segment, **fused_kw,
    )
    ref_n = len(ref_sc["reconstruction_mse"])
    assert ref_n > 0

    pend = score_frames_fused_start(
        model, params, segs, greens, _threshold_mask_fn,
        fallback_segment_fn=threshold_segment, mesh=mesh, **fused_kw,
    )
    pend["flat_dev"] = np.asarray(
        multihost_utils.process_allgather(pend["flat_dev"], tiled=True)
    ).reshape(N_PROC * LOCAL_DEVICES, -1)
    mesh_sc, mesh_stats = score_frames_fused_wait(pend)
    mesh_n = len(mesh_sc["reconstruction_mse"])
    # shard order == frame order here (1 frame per device), so the cell
    # multisets and every anomaly count must match the local run exactly
    assert mesh_n == ref_n, (mesh_n, ref_n)
    np.testing.assert_array_equal(
        np.sort(mesh_sc["reconstruction_mse"]),
        np.sort(ref_sc["reconstruction_mse"]))
    fused_counts = []
    for det in ("conservative", "moderate", "ensemble", "fft"):
        a = int(np.sum(mesh_sc[f"{det}_predictions"] == -1))
        b = int(np.sum(ref_sc[f"{det}_predictions"] == -1))
        assert a == b, (det, a, b)
        fused_counts.append(a)

    if proc_id == 0:
        print(f"dryrun_dcn: {N_PROC} processes x {LOCAL_DEVICES} devices, "
              f"global rate {got:.6f} == local reference; score_cells "
              f"pipeline counts {got_counts} (cons/mod/ens/fft over "
              f"{n_cells} sharded cells) == single-process; fused "
              f"score_frames graph over {n_frames} cross-process-sharded "
              f"frames: {mesh_n} cells, counts {tuple(fused_counts)} == "
              f"single-process — OK", flush=True)
    jax.distributed.shutdown()


def launcher() -> int:
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "WORKER", str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        if p.returncode != 0:
            rc = rc or p.returncode or 1
        tail = "\n".join(out.strip().splitlines()[-8:])
        if i == 0 or p.returncode != 0:
            print(f"[worker {i} rc={p.returncode}]\n{tail}")
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "WORKER":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(launcher())
