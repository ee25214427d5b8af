"""True multi-process rendezvous smoke: two OS processes, one global mesh.

The rest of the suite exercises multi-chip sharding on 8 virtual devices in
ONE process; this file is the multi-HOST check the reference takes on faith
from ``dist.init_process_group`` (reference util/misc.py:212-242). Two
subprocesses rendezvous through ``initialize_distributed`` (DCN-equivalent:
the JAX distributed runtime + gloo CPU collectives), build a shared
("data", "fsdp", "tensor") mesh spanning both hosts' devices, run a jitted
cross-host reduction, and sync a :class:`SmoothedValue` meter — the actual
surfaces the train drivers use on pods.
"""

import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    # One device per process: drop the 8-virtual-device flag inherited from
    # the parent pytest environment.
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    os.environ["TAE_TPU_ATTN"] = "xla"
    pid, nproc, addr, repo = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, repo)
    from tae_tpu.parallel.mesh import initialize_distributed, make_mesh, is_main_process
    initialize_distributed(coordinator_address=addr, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc, jax.device_count()
    assert is_main_process() == (pid == 0)
    mesh = make_mesh(data=nproc)

    import numpy as np, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    # Jitted cross-host reduction over the data axis (GSPMD inserts the
    # inter-process all-reduce — the NCCL-allreduce equivalent).
    local = np.full((1, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local)
    out = jax.jit(lambda x: jnp.sum(x, axis=0),
                  out_shardings=NamedSharding(mesh, P(None)))(garr)
    val = np.asarray(out.addressable_data(0))
    assert np.allclose(val, sum(range(1, nproc + 1))), val

    # Meter sync across hosts (reference util/misc.py:42-53).
    from tae_tpu.utils.meters import SmoothedValue
    m = SmoothedValue()
    m.update(float(pid + 1), n=2)
    m.synchronize_between_processes()
    assert m.count == 2 * nproc, m.count
    assert abs(m.total - 2.0 * sum(range(1, nproc + 1))) < 1e-9, m.total

    # --- sharded train step with params fsdp-sharded ACROSS the processes
    # (each host owns half of every weight; GSPMD inserts the inter-process
    # all-gathers + grad reduce-scatters — the NCCL-DDP equivalent the
    # reference assumes from DistributedDataParallel, train.py:102) ---
    from tae_tpu.models.tae import TAE, TAEConfig
    from tae_tpu.parallel import batch_sharding, param_shardings
    from tae_tpu.train import TrainState, adamw, make_train_step, step_lr
    from tae_tpu.utils.dtypes import FP32

    mesh2 = make_mesh(data=1, fsdp=nproc)
    cfg = TAEConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=4, decoder_embed_dim=64, decoder_depth=2,
                    decoder_num_heads=4, vocab_size=16)
    model = TAE(cfg)
    shardings = param_shardings(jax.eval_shape(model.init, jax.random.key(0)),
                                mesh2)
    params = jax.jit(model.init, out_shardings=shardings)(jax.random.key(0))
    opt = adamw(weight_decay=0.0)
    state = TrainState.create(params, opt)
    loss_fn = lambda p, b: (model.forward(p, b, policy=FP32)[0], {})
    step = jax.jit(make_train_step(loss_fn, opt, step_lr(1e-3, 1e-4, 10)))
    local = np.random.default_rng(pid).normal(
        size=(2, 3, 32, 32)).astype(np.float32)
    batch = jax.make_array_from_process_local_data(batch_sharding(mesh2), local)
    state, metrics = step(state, batch, jnp.int32(0))
    l0 = float(metrics["loss"])
    state, metrics = step(state, batch, jnp.int32(1))
    l1 = float(metrics["loss"])
    assert np.isfinite(l0) and np.isfinite(l1), (l0, l1)
    assert l1 != l0  # params actually updated across the fsdp boundary

    # --- cross-process checkpoint round-trip (exercises the barriers and
    # the process-0-only atomic swap in ckpt/io.py:62-96) ---
    from tae_tpu.ckpt.io import load_checkpoint, save_checkpoint
    ckpt_dir = sys.argv[5]
    save_checkpoint(ckpt_dir, {"params": state.params}, step=7,
                    extra={"eval": l1})
    restored, meta = load_checkpoint(ckpt_dir,
                                     target={"params": state.params})
    assert int(meta["step"]) == 7, meta
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a.addressable_data(0)),
                                      np.asarray(b.addressable_data(0)))
    # a second save into the same dir drives the swap path (tree -> .old)
    save_checkpoint(ckpt_dir, {"params": state.params}, step=8)
    _, meta2 = load_checkpoint(ckpt_dir, target={"params": state.params})
    assert int(meta2["step"]) == 8, meta2
    print(f"MULTIHOST_OK pid={pid}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_rendezvous(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    nproc = 2
    addr = f"localhost:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_dir = str(tmp_path / "ckpt")  # shared dir = the pod's shared fs
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(nproc), addr, repo,
             ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
