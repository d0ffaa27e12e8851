"""Standalone repro: XLA GSPMD returns WRONG VALUES for a stack of two
vmapped-kernel (grouped) 1-D convolutions when the kernel batch axis is
sharded across devices.

Context: sm_hpss_mtl_tpu's vmapped multi-trial trainer
(train/multitrial.py) wants to shard the trial axis of stacked model
params with GSPMD; two convs in sequence silently miscompile, so
`fit_multi` uses shard_map instead (which sidesteps the partitioner).
Pinned by tests/test_multitrial.py::test_gspmd_sharded_vmapped_conv_stack
(xfail); this file is the minimized upstream-report form.

Run:  python tools/repro_gspmd_conv.py   (self-contained: forces a
4-virtual-device CPU backend before importing jax, overriding any
sitecustomize that pre-points jax at an accelerator).
Exit status 1 = bug reproduces (sharded != unsharded), 0 = fixed.

One conv alone agrees; it is specifically the *sequence* of two sharded
grouped convs that returns wrong values (observed max abs error ~O(1)
on values of O(1), not a tolerance issue).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def conv1d(x, w):
    # x: (B, T, Cin), w: (K, Cin, Cout) — plain XLA conv, SAME padding.
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))


def two_convs(params, x):
    return conv1d(jax.nn.relu(conv1d(x, params["w1"])), params["w2"])


def main() -> int:
    n_dev = min(len(jax.devices()), 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((6, 32, 32)), jnp.float32)
    # A batch of n_dev independent parameter sets (the vmapped-trial axis).
    params = {
        "w1": jnp.asarray(rng.standard_normal((n_dev, 3, 32, 32)) * 0.1,
                          jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((n_dev, 1, 32, 32)) * 0.1,
                          jnp.float32),
    }
    vf = jax.jit(jax.vmap(two_convs, in_axes=(0, None)))
    expect = np.asarray(vf(params, x))

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("trial",))
    sharded_params = jax.device_put(params, NamedSharding(mesh, P("trial")))
    got = np.asarray(vf(sharded_params, jax.device_put(
        x, NamedSharding(mesh, P()))))

    err = np.max(np.abs(expect - got))
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"{n_dev} devices: max|unsharded - sharded| = {err:.3g}")
    if err > 1e-5:
        print("BUG REPRODUCES: GSPMD-sharded stacked vmapped convs "
              "return wrong values")
        return 1
    print("bug not reproduced (fixed upstream?) — "
          "tests/test_multitrial.py xfail should start passing")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
