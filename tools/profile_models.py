"""Per-model step-time profiler (VERDICT r1 weak #4, r2 weak #6).

Times, on the real chip with the tunnel-honest ``time_op``:

  * the full jitted MTL train step at the reference batch (48) and each
    model's reference input geometry,
  * the forward pass alone,
  * isolated sub-blocks (conv trunk / LRN / dense stack) for the CNNs,

and reports XLA's cost analysis (FLOPs and bytes accessed) so achieved
FLOP/s and achieved HBM bandwidth vs the v5e peaks tell whether a step
time is a lowering problem or an honest roofline.  Writes one JSON with
everything.

Every model is measured in its OWN subprocess (shared persistent
compile cache): sub-ms programs measure up to 10x slower in a process
holding many compiled programs (NOTES.md r3 — the old in-process run
reported the Lemaire step at 3.05 ms vs 0.26 ms isolated).

    python tools/profile_models.py --out PROFILE_models.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from sm_hpss_mtl_tpu.models import get_model
from sm_hpss_mtl_tpu.train import TrainState, for_model
from sm_hpss_mtl_tpu.train.state import make_train_step
from sm_hpss_mtl_tpu.utils.benchmarking import time_op

# Reference geometries: (model, input shape at batch 48, W=68).
CASES = {
    "Doukhan_et_al_MTL": (48, 240, 68, 1),       # MelHarmPercSpec 120x2
    "Papakostas_et_al_MTL": (48, 402, 68, 1),    # HarmPercSpec 201x2
    "Jang_et_al_MTL": (48, 514, 68, 1),          # LogHarmPercSpec 257x2
    "Lemaire_et_al_MTL": (48, 68, 240),          # time_mel
}


def mtl_labels(n):
    y = np.arange(n) % 3
    onehot = np.zeros((n, 3), np.float32)
    onehot[np.arange(n), y] = 1
    return {
        "S": jnp.asarray((y == 1).astype(np.float32)),
        "M": jnp.asarray((y == 0).astype(np.float32)),
        "R": jnp.asarray(np.stack([(y == 0), (y == 1)], -1)
                         .astype(np.float32)),
        "3C": jnp.asarray(onehot),
    }


#: v5e per-chip peaks (public spec): 819 GB/s HBM, 197 bf16 TFLOP/s
#: (f32 via MXU passes ~1/4 of that).
V5E_HBM_GBPS = 819.0

def cost_of(fn, *args):
    """(flops, bytes_accessed) from XLA's own cost model — bytes
    accessed is the compiler's HBM-traffic estimate across fusion
    boundaries, the numerator of the bandwidth roofline."""
    try:
        comp = jax.jit(fn).lower(*args).compile()
        cost = comp.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return (float(cost.get("flops", float("nan"))),
                float(cost.get("bytes accessed", float("nan"))))
    except Exception:
        return float("nan"), float("nan")


def flops_of(fn, *args):
    return cost_of(fn, *args)[0]


def time_train_step(name, spec, x, labels, rng):
    opt, _ = for_model(name, tr_steps=1000)
    state = TrainState.create(spec.module, opt, x, rng)
    step = make_train_step(spec.module, opt, mtl=True)

    def carry_step(carry):
        st, xx = carry
        st2, _ = step(st, xx, labels, rng)
        return (st2, xx)

    t = time_op(carry_step, (state, x), iters=(2, 10), repeats=3)
    if t * 1e3 < 0.05:
        # Sub-50us differencing underflows in a noisy window (seen as a
        # 0.0 row for the Lemaire TCN); re-measure with a longer chain.
        t = time_op(carry_step, (state, x), iters=(10, 110), repeats=3)
    fl, by = cost_of(lambda s, xx: step(s, xx, labels, rng)[0].params,
                     state, x)
    return t, fl, by


def time_forward(spec, x, rng):
    variables = spec.module.init({"params": rng, "dropout": rng}, x,
                                 train=False)

    # Weights ride the carry, NOT a closure: closed-over params are baked
    # into the HLO as constants, and the tunnel rejects >~100 MB uploads.
    def fwd(vv, xx):
        out = spec.module.apply(vv, xx, train=False)
        return out["3C"] if isinstance(out, dict) else out

    def carry_step(carry):
        vv, xx = carry
        p = fwd(vv, xx)
        return (vv, xx * (1.0 + 1e-12 * jnp.sum(p)))

    t = time_op(carry_step, (variables, x), iters=(2, 10), repeats=3)
    if t * 1e3 < 0.05:
        t = time_op(carry_step, (variables, x), iters=(10, 110), repeats=3)
    return t, flops_of(fwd, variables, x)


def time_block(fn, x):
    def carry_step(xx):
        y = fn(xx)
        s = jnp.sum(y.astype(jnp.float32))
        return xx * (1.0 + 1e-12 * s)
    t = time_op(carry_step, x, iters=(2, 10), repeats=3)
    if t * 1e3 < 0.05:
        t = time_op(carry_step, x, iters=(10, 110), repeats=3)
    return t, flops_of(fn, x)


def lrn_block(x):
    from sm_hpss_mtl_tpu.models.cnn import local_response_normalization
    return local_response_normalization(x)


def model_row(name):
    rng = jax.random.PRNGKey(0)
    labels = mtl_labels(48)
    shape = CASES[name]
    x = jax.random.normal(rng, shape, jnp.float32)
    # Zoo defaults = reference geometry (Jang MTL keeps its internal
    # 120-band mel-scale layer regardless of the raw-spec features).
    spec = get_model(name)
    t_step, fl_step, by_step = time_train_step(name, spec, x, labels, rng)
    t_fwd, fl_fwd = time_forward(spec, x, rng)
    spec16 = get_model(name, dtype=jnp.bfloat16)
    t16, fl16, by16 = time_train_step(name, spec16, x, labels, rng)
    gbps = by_step / t_step / 1e9
    return {
        "input": list(shape),
        "train_step_ms": round(t_step * 1e3, 3),
        "train_step_gflops": round(fl_step / 1e9, 2),
        "train_step_tflops_per_s": round(fl_step / t_step / 1e12, 2),
        "train_step_bytes_gb": round(by_step / 1e9, 3),
        "train_step_achieved_gbps": round(gbps, 1),
        "train_step_hbm_frac": round(gbps / V5E_HBM_GBPS, 3),
        "train_step_bf16_ms": round(t16 * 1e3, 3),
        "train_step_bf16_achieved_gbps": round(by16 / t16 / 1e9, 1),
        "forward_ms": round(t_fwd * 1e3, 3),
        "forward_gflops": round(fl_fwd / 1e9, 2),
        "forward_tflops_per_s": round(fl_fwd / t_fwd / 1e12, 2),
    }


def lrn_rows():
    rng = jax.random.PRNGKey(0)
    rows = {}
    for tag, shape in (("lrn_c1", (48, 199, 32, 96)),
                       ("lrn_c2", (48, 49, 7, 384))):
        x = jax.random.normal(rng, shape, jnp.float32)
        t, fl = time_block(lrn_block, x)
        rows[tag] = {"shape": list(shape), "ms": round(t * 1e3, 3)}
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="PROFILE_models.json")
    p.add_argument("--jax-cache", default="/tmp/profile_jaxcache")
    p.add_argument("--child", default=None,
                   help="internal: profile one model (or 'lrn') and print "
                        "its JSON row")
    args = p.parse_args(argv)

    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.child:
        row = lrn_rows() if args.child == "lrn" else model_row(args.child)
        print(json.dumps({"child": args.child, "row": row}))
        return

    report = {"backend": jax.default_backend(), "models": {},
              "methodology": "each model profiled in its own subprocess "
                             "(resident-program contamination, NOTES r3); "
                             "time_op chained-iteration differencing"}
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    for child in list(CASES) + ["lrn"]:
        cmd = [sys.executable, os.path.abspath(__file__), "--child", child,
               "--jax-cache", args.jax_cache]
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=1800)
        if proc.returncode != 0:
            raise RuntimeError(f"child {child} failed\n{proc.stdout[-2000:]}"
                               f"\n{proc.stderr[-2000:]}")
        row = json.loads(proc.stdout.strip().splitlines()[-1])["row"]
        if child == "lrn":
            report.update(row)
        else:
            report["models"][child] = row
        print(child, json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()
