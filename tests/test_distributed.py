"""Multi-host wiring tests (SURVEY.md §2.5 comm-backend row).

The single-process pieces (env gating, per-process seeds, file sharding)
are unit-tested directly; the real thing — two OS processes joined by
``jax.distributed.initialize()`` running a global-mesh collective over
8 virtual CPU devices (4 per process) — runs as a subprocess test.
"""

import os
import socket
import subprocess
import sys

import numpy as np

from sm_hpss_mtl_tpu.parallel import (initialize_from_env, per_process_seed,
                                      process_file_shard)


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("SMHPSS_DISTRIBUTED", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_from_env() is False


def test_per_process_seed_identity_single_process():
    # Single process => process_index 0 => seed unchanged.
    assert per_process_seed(42) == 42


def test_process_file_shard_disjoint_and_balanced():
    files = {"music": [f"mu{i}" for i in range(10)],
             "speech": [f"sp{i}" for i in range(7)],
             "noise": ["no0"]}  # fewer files than processes
    shards = [process_file_shard(files, process_index=i, process_count=3)
              for i in range(3)]
    # Disjoint + complete cover for the big classes.
    for cls in ("music", "speech"):
        seen = [f for s in shards for f in s[cls]]
        assert sorted(seen) == sorted(files[cls])
        assert len(set(seen)) == len(seen)
    # Short class falls back to the full list on every process.
    for s in shards:
        assert s["noise"] == ["no0"]
    # Single process: identity.
    assert process_file_shard(files, process_index=0,
                              process_count=1) is files


_WORKER = """\
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from sm_hpss_mtl_tpu.parallel import initialize_from_env, make_mesh, \\
    per_process_seed, process_file_shard

assert initialize_from_env() is True
assert jax.process_count() == 2
assert len(jax.devices()) == 8  # 4 local x 2 processes, global view

mesh = make_mesh()  # ('data'=8, 'time'=1, 'model'=1) over global devices
local = np.full((4, 2), float(jax.process_index()), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8, 2))
# Cross-process (DCN-analog) collective: global sum must see both hosts.
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 8.0, float(total)

# Per-process stream decorrelation helpers under a real 2-process setup.
assert per_process_seed(7) != 7 or jax.process_index() == 0
files = {"music": ["a", "b", "c", "d"]}
mine = process_file_shard(files)
assert len(mine["music"]) == 2
print("worker", jax.process_index(), "ok")
"""


def test_two_process_cpu_collective(tmp_path):
    """Two real processes, jax.distributed-joined, one global-mesh psum."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env_base = dict(os.environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env_base.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env_base["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    env_base["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    env_base["JAX_NUM_PROCESSES"] = "2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base["PYTHONPATH"] = repo + os.pathsep + env_base.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} rc={p.returncode}\n{out}\n{err}")
        assert f"worker {pid} ok" in out
