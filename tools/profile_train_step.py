"""Per-op TPU profile of the flagship bf16 train step (or forward only).

Captures a jax.profiler trace of N chained train steps (one fori_loop, data-
dependent — same discipline as bench.py), parses the .xplane.pb on the host,
and prints rollups by XLA hlo_category, by model module (the ``tf_op`` path
XLA records per HLO), and by source file:line, plus the top ops by self
time with per-op achieved HBM bandwidth. Leaf-only attribution: control-flow
umbrella events (the fori_loop's ``while`` spans everything inside it) are
excluded via an interval-containment sweep, and the overlapped async-DMA
line is reported separately — never added to the TensorCore total.

Usage:  python tools/profile_train_step.py [--steps 10] [--top 30]
            [--mode train|fwd] [--bs 8] [--packed]
Output: human-readable tables on stderr + one JSON line on stdout
        (committed as docs/profile_rXX.json for the perf narrative).

The xplane proto needs the pure-python protobuf impl (the C++ one rejects
the tensorboard-plugin-free parse path).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_train_loop():
    import dataclasses as _dc
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _host_init_params
    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.losses import pairwise_neg_snr, pit_loss
    from rtfs_tpu.utils.precision import cast_params

    conf = load_config("lrs2_RTFSNet_4_layer")
    model = build_avnet(conf)
    wav1 = jnp.zeros((1, 32000), jnp.float32)
    emb1 = jnp.zeros((1, 50, 512), jnp.float32)
    variables = jax.device_put(_host_init_params(model, wav1, emb1))
    model = _dc.replace(model, compute_dtype="bfloat16")
    variables = cast_params(variables)

    rng = np.random.default_rng(0)
    bs = 8
    wav = jnp.asarray(rng.standard_normal((bs, 32000)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((bs, 50, 512)).astype(np.float32))
    tgt = wav[:, None] * 0.7
    opt = optax.adamw(1e-3)

    def loss_fn(params, bstats):
        # train=True matches the production step (train/system.py:204) —
        # it also selects the training lowering of the DualPathRNN tail
        # (the fused inference-only ConvT kernel is gated on `not train`).
        ests, _ = model.apply(
            {"params": params, "batch_stats": bstats}, wav, emb,
            train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return pit_loss(pairwise_neg_snr, ests, tgt)

    @partial(jax.jit, static_argnames="n_iter")
    def train_loop(params, bstats, opt_state, n_iter):
        def body(_, carry):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params, bstats)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        params, opt_state = jax.lax.fori_loop(0, n_iter, body,
                                              (params, opt_state))
        return loss_fn(params, bstats)

    bstats = variables.get("batch_stats", {})
    opt_state = opt.init(variables["params"])
    return train_loop, (variables["params"], bstats, opt_state)


def build_fwd_loop(bs: int = 8, packed: bool = False):
    """Chained bf16 forward loop at the given batch size (bench.py shape)."""
    import dataclasses as _dc
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _host_init_params
    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.utils.precision import cast_params

    conf = load_config("lrs2_RTFSNet_4_layer")
    model = build_avnet(conf)
    wav1 = jnp.zeros((1, 32000), jnp.float32)
    emb1 = jnp.zeros((1, 50, 512), jnp.float32)
    variables = jax.device_put(_host_init_params(model, wav1, emb1))
    model = _dc.replace(model, compute_dtype="bfloat16", packed_tf=packed)
    variables = cast_params(variables)

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((bs, 32000)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((bs, 50, 512)).astype(np.float32))

    @partial(jax.jit, static_argnames="n_iter")
    def fwd_loop(v, n_iter):
        def body(_, carry):
            out = model.apply(v, wav + 1e-12 * carry, emb)
            return jnp.sum(out)

        return jax.lax.fori_loop(0, n_iter, body, jnp.zeros((), jnp.float32))

    return fwd_loop, (variables,)


class OpRecord(
    collections.namedtuple(
        "OpRecord", "dur_ps category tf_op source bytes_total"
    )
):
    pass


def parse_xplane(logdir):
    """Returns (sync_records, async_total_ps).

    sync_records: display_name -> OpRecord with leaf-only summed duration
    plus the category/module/source stats XLA attaches per HLO.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())

    def leaf_durations(line):
        """metadata_id -> (summed duration, occurrence count), LEAF events
        only."""
        evs = sorted((ev.offset_ps, ev.duration_ps, ev.metadata_id)
                     for ev in line.events)
        out = {}

        def add(m, d):
            dur, n = out.get(m, (0, 0))
            out[m] = (dur + d, n + 1)

        stack = []  # [end_ps, start_ps, mid, is_parent]
        for start, dur, mid in evs:
            end = start + dur
            while stack and stack[-1][0] <= start:
                e, s, m, is_parent = stack.pop()
                if not is_parent:
                    add(m, e - s)
            if stack:
                stack[-1][3] = True
            stack.append([end, start, mid, False])
        while stack:
            e, s, m, is_parent = stack.pop()
            if not is_parent:
                add(m, e - s)
        return out

    records = {}
    async_total = 0
    async_bytes = 0
    peak_hbm_gbps = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name:
            continue
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        for st in plane.stats:
            if stat_names.get(st.metadata_id) == \
                    "peak_hbm_bw_gigabytes_per_second":
                peak_hbm_gbps = st.double_value

        def meta_bytes(mid):
            # per-execution bytes_accessed from the op metadata (the TPU
            # profiler's layout-aware traffic estimate for this HLO)
            for st in plane.event_metadata[mid].stats:
                if stat_names.get(st.metadata_id) == "bytes_accessed":
                    return st.uint64_value or st.int64_value or 0
            return 0

        for line in plane.lines:
            if line.name == "Async XLA Ops":
                for mid, (dur, n) in leaf_durations(line).items():
                    async_total += dur
                    async_bytes += n * meta_bytes(mid)
                continue
            if line.name != "XLA Ops":
                continue
            for mid, (dur, n) in leaf_durations(line).items():
                meta = plane.event_metadata[mid]
                stats = {}
                for st in meta.stats:
                    nm = stat_names.get(st.metadata_id)
                    stats[nm] = st.str_value or stat_names.get(st.ref_value)
                key = meta.display_name or meta.name
                prev = records.get(key)
                rec = OpRecord(
                    dur_ps=dur + (prev.dur_ps if prev else 0),
                    category=stats.get("hlo_category", "?"),
                    tf_op=stats.get("tf_op", ""),
                    source=stats.get("source", ""),
                    bytes_total=n * meta_bytes(mid)
                    + (prev.bytes_total if prev else 0),
                )
                records[key] = rec
    return records, async_total, async_bytes, peak_hbm_gbps


def module_of(tf_op: str) -> str:
    """Collapse a tf_op path to its model-module segment."""
    parts = [p for p in tf_op.split("/") if p]
    # drop jit/while/body/closed_call/jvp/transpose wrappers
    keep = [p for p in parts
            if not (p.startswith("jit(") or p in ("while", "body", "cond")
                    or p.startswith("closed_call") or p.startswith("jvp(")
                    or p.startswith("transpose("))]
    return "/".join(keep[:3]) if keep else (parts[-1] if parts else "?")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--mode", choices=("train", "fwd"), default="train")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--packed", action="store_true")
    args = ap.parse_args()

    import jax

    if args.mode == "fwd":
        train_loop, state = build_fwd_loop(bs=args.bs, packed=args.packed)
    else:
        train_loop, state = build_train_loop()
    float(train_loop(*state, args.steps))  # compile outside the trace

    logdir = args.logdir or tempfile.mkdtemp(prefix="rtfs_prof_")
    jax.profiler.start_trace(logdir)
    float(train_loop(*state, args.steps))
    jax.profiler.stop_trace()

    records, async_total, async_bytes, peak_hbm_gbps = parse_xplane(logdir)
    total_ps = sum(r.dur_ps for r in records.values())
    per_step_ms = total_ps / 1e9 / args.steps
    sync_bytes = sum(r.bytes_total for r in records.values())
    hbm_gb_step = (sync_bytes + async_bytes) / 1e9 / args.steps
    # wall time for BW purposes = sync op time (async DMA overlaps it)
    achieved_gbps = hbm_gb_step / (per_step_ms / 1e3) if per_step_ms else 0
    hbm_frac = achieved_gbps / peak_hbm_gbps if peak_hbm_gbps else 0

    def rollup(keyfn):
        c = collections.Counter()
        for name, r in records.items():
            c[keyfn(name, r)] += r.dur_ps
        return c

    cats = rollup(lambda n, r: r.category)
    mods = rollup(lambda n, r: module_of(r.tf_op))
    srcs = rollup(lambda n, r: r.source or "?")

    print(f"# trace: {logdir}", file=sys.stderr)
    print(f"# TensorCore op time: {per_step_ms:.2f} ms/step x {args.steps} "
          f"(+ {async_total/1e9/args.steps:.2f} ms/step async DMA, "
          f"overlapped)", file=sys.stderr)
    print(f"# HBM traffic (profiler, layout-aware): {hbm_gb_step:.1f} "
          f"GB/step -> {achieved_gbps:.0f} GB/s achieved = "
          f"{100*hbm_frac:.0f}% of peak {peak_hbm_gbps:.0f} GB/s",
          file=sys.stderr)

    def show(title, counter, k=18):
        print(f"#\n# --- {title} ---", file=sys.stderr)
        for key, ps in counter.most_common(k):
            ms = ps / 1e9 / args.steps
            print(f"# {ms:8.3f} ms/step ({100*ps/max(total_ps,1):5.1f}%)  "
                  f"{str(key)[:95]}", file=sys.stderr)

    show("by hlo_category", cats)
    show("by module", mods)
    show("by source line", srcs)
    print(f"#\n# --- top {args.top} ops ---", file=sys.stderr)
    top = sorted(records.items(), key=lambda kv: -kv[1].dur_ps)[:args.top]
    for name, r in top:
        ms = r.dur_ps / 1e9 / args.steps
        mb = r.bytes_total / 1e6 / args.steps
        gbps = r.bytes_total / 1e9 / (r.dur_ps / 1e12) if r.dur_ps else 0.0
        print(f"# {ms:8.4f} ms/step {mb:9.1f} MB {gbps:6.0f} GB/s  "
              f"{r.category:18s} {name:22s} "
              f"{module_of(r.tf_op)[:52]}", file=sys.stderr)

    print(json.dumps({
        "per_step_device_ms": round(per_step_ms, 3),
        "per_step_async_dma_ms": round(async_total / 1e9 / args.steps, 3),
        "hbm_gb_per_step": round(hbm_gb_step, 2),
        "achieved_hbm_gbps": round(achieved_gbps, 1),
        "hbm_roofline_frac": round(hbm_frac, 3),
        "peak_hbm_gbps": round(peak_hbm_gbps, 1),
        "steps": args.steps,
        "by_category_ms": {c: round(ps / 1e9 / args.steps, 3)
                           for c, ps in cats.most_common()},
        "by_module_ms": {m: round(ps / 1e9 / args.steps, 3)
                         for m, ps in mods.most_common(25)},
        "by_source_ms": {s: round(ps / 1e9 / args.steps, 3)
                         for s, ps in srcs.most_common(25)},
        "top_ops_ms": {n: round(r.dur_ps / 1e9 / args.steps, 4)
                       for n, r in top},
    }))


if __name__ == "__main__":
    main()
