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
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(nproc), addr, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
