"""Benchmark: RTFS-Net family inference + train throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric: audio-seconds separated per wall-clock second per chip on
the flagship RTFS-Net-4 / LRS2 config (2 s @ 16 kHz utterances, 50
video-frame embeddings), steady state, best over a small batch-size sweep.
The same JSON line also carries (VERDICT r3 #2/#6):
  - ``family``: bs=1 bf16 latency + bs=8 bf16 throughput for RTFS-Net-6,
    RTFS-Net-12, CTCNet-16 and TDFNet-16_3, with the reference's published
    per-model inference times (BASELINE.md) as ``ref_ms`` where they exist;
  - ``e2e_*``: the FULL serving pipeline (mouth frames → frozen
    FRCNNVideoModel → AVNet) in one jitted call, so the video backbone's
    cost is included (the AVNet-only numbers remain comparable to the
    reference's AVNet-only MACs accounting).

Measurement protocol (variance-proof, VERDICT r2 #1):
- N forwards chained inside ONE on-device fori_loop (step i's input
  depends on step i-1's output), ended by a host fetch of a dependent
  scalar — immune to dispatch pipelining/dedup through the tunnel.
- Every config is timed REPEATS times; the headline is the MEDIAN and
  the JSON carries the min-max spread so run-to-run noise is visible.
- The per-step estimator subtracts a separately-measured 1-iter
  dispatch+fetch overhead; if that sample glitches the estimator falls
  back to a plain mean and SAYS SO (``estimator`` field, ADVICE r2).
  Note the train loop closes with a trailing loss eval: the subtraction
  total(N) - total(1) cancels it exactly, so timing is uncontaminated.

Roofline context: the train step is memory-bound, so next to MFU the
bench reports the achieved-HBM-bandwidth fraction from MEASURED per-op
profiler bytes. The profiled loop is a bare-step loop ending in a tiny
param-leaf fetch — no trailing loss eval (ADVICE r3: profiling
train_loop overstated GB/step by ~a forward per 10 steps).

Baseline: the reference reports 57.8 ms inference for one 2 s utterance
(RTFS-Net-4, README main table / BASELINE.md) = 34.6 audio-seconds/s.
``vs_baseline`` = ours / 34.6 (higher is better).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

BASELINE_AUDIO_SEC_PER_S = 2.0 / 0.0578  # reference: 57.8 ms per 2 s utterance
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9
REPEATS = 5

# Reference per-model inference times (ms / 2 s utterance, BASELINE.md:23-25).
FAMILY = (
    # (config name, short key, reference ms or None)
    ("lrs2_RTFSNet_6_layer", "rtfsnet6", 64.7),
    ("lrs2_RTFSNet_12_layer", "rtfsnet12", 109.9),
    ("lrs2_CTCNet_16_layer", "ctcnet16", 122.7),
    ("lrs2_TDFNet_16_3", "tdfnet16_3", None),  # no published time
)


def _timed(fn, *args, n_iter: int, repeats: int = REPEATS,
           retries: int = 1):
    """Median per-step seconds of a chained n_iter loop + estimator info.

    fn(*args, 1) and fn(*args, n_iter) must be the compiled 1-iter and
    N-iter variants (compiled on first call). Returns
    (dt_median, spread_pct, estimator) or raises. Transient tunnel/compile
    failures are retried once so a flaky remote-compile RPC does not drop
    a row from the capture.
    """
    for attempt in range(retries + 1):
        try:
            return _timed_once(fn, *args, n_iter=n_iter, repeats=repeats)
        except Exception:
            if attempt == retries:
                raise
            print("# _timed transient failure, retrying", file=sys.stderr)
            time.sleep(5.0)


def _timed_once(fn, *args, n_iter: int, repeats: int = REPEATS):
    float(fn(*args, 1))       # compile 1-iter
    float(fn(*args, n_iter))  # compile N-iter
    overheads, totals = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args, 1))
        overheads.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fn(*args, n_iter))
        totals.append(time.perf_counter() - t0)
    overhead = statistics.median(overheads)
    total_med = statistics.median(totals)
    if total_med > 2 * overhead:
        dts = [(t - overhead) / (n_iter - 1) for t in totals]
        estimator = "overhead-subtracted"
    else:  # overhead sample glitched (tunnel hiccup): plain mean
        dts = [t / n_iter for t in totals]
        estimator = "plain-mean"
    dt = statistics.median(dts)
    spread_pct = 100.0 * (max(dts) - min(dts)) / dt if dt > 0 else 0.0
    return dt, spread_pct, estimator


def _make_fwd_loop(mdl, jax, jnp):
    from functools import partial

    @partial(jax.jit, static_argnames="n_iter")
    def fwd_loop(v, w, m, n_iter):
        def body(_, carry):
            out = mdl.apply(v, w + 1e-12 * carry, m)
            return jnp.sum(out)

        return jax.lax.fori_loop(0, n_iter, body, jnp.zeros((), jnp.float32))

    return fwd_loop


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _host_init_params
    from rtfs_tpu.config import build_avnet, load_config

    from rtfs_tpu.utils.precision import cast_params

    conf = load_config("lrs2_RTFSNet_4_layer")
    model = build_avnet(conf)
    wav1 = jnp.zeros((1, 32000), jnp.float32)
    emb1 = jnp.zeros((1, 50, 512), jnp.float32)
    variables = _host_init_params(model, wav1, emb1)
    variables = jax.device_put(variables)

    import dataclasses as _dc

    model_bf16 = _dc.replace(model, compute_dtype="bfloat16")
    variables_bf16 = cast_params(variables)

    from functools import partial

    # packed-TF layout (ops/packed_tf.py): loses at batch>=8 (fusion-break
    # bytes) but WINS bs=1 latency — XLA's depthwise convs cost the same
    # at bs 1 as bs 8 (dispatch-bound), the packed kernels don't. Measured
    # r4: 4.7 vs 5.9 ms. Benched as the serving-latency configuration.
    model_packed = _dc.replace(
        model, compute_dtype="bfloat16", packed_tf=True
    )

    loops = {
        "f32": _make_fwd_loop(model, jax, jnp),
        "bf16": _make_fwd_loop(model_bf16, jax, jnp),
        "bf16_packed": _make_fwd_loop(model_packed, jax, jnp),
    }

    rng = np.random.default_rng(0)
    best = 0.0
    best_bs = 0
    best_prec = "f32"
    best_spread = 0.0
    best_estimator = ""
    latency = {}
    for bs, prec in ((1, "f32"), (1, "bf16"), (1, "bf16_packed"),
                     (8, "f32"), (8, "bf16"), (16, "bf16"), (32, "bf16")):
        v = variables if prec == "f32" else variables_bf16
        wav = jnp.asarray(rng.standard_normal((bs, 32000)).astype(np.float32))
        emb = jnp.asarray(
            rng.standard_normal((bs, 50, 512)).astype(np.float32)
        )
        try:
            dt, spread, estimator = _timed(loops[prec], v, wav, emb, n_iter=20)
        except Exception as e:  # a failed variant must not kill the bench
            print(f"# bs={bs} {prec} FAILED: {type(e).__name__}",
                  file=sys.stderr)
            continue
        audio_sec_per_s = bs * 2.0 / dt
        print(
            f"# bs={bs} {prec}: {dt*1e3:.2f} ms/step "
            f"(median of {REPEATS}, spread {spread:.1f}%, {estimator}), "
            f"{audio_sec_per_s:.0f} audio-s/s",
            file=sys.stderr,
        )
        if bs == 1:
            # single-utterance latency: the reference's headline metric is
            # 57.8 ms for one 2 s utterance (RTFS-Net-4, README table)
            latency[f"latency_bs1_{prec}_ms"] = round(dt * 1e3, 2)
            continue  # throughput headline comes from batched runs
        if audio_sec_per_s > best:
            best, best_bs, best_prec = audio_sec_per_s, bs, prec
            best_spread, best_estimator = spread, estimator

    # ---- model family: bs=1 latency + bs=8 throughput, bf16 -------------
    # Pins the RTFS-6/12, CTCNet-16 and TDFNet numbers README/design.md
    # claim into a driver-captured artifact (VERDICT r3 #2).
    family_stats = {}
    for cfg_name, key, ref_ms in FAMILY:
        try:
            fconf = load_config(cfg_name)
            fmodel = _dc.replace(
                build_avnet(fconf), compute_dtype="bfloat16"
            )
            fvars = cast_params(
                jax.device_put(_host_init_params(fmodel, wav1, emb1))
            )
            floop = _make_fwd_loop(fmodel, jax, jnp)
            entry = {}
            if key == "rtfsnet12":
                # the accuracy flagship also gets the packed serving
                # configuration (packed-TF + fused ConvT tail), its best
                # single-utterance latency path (r4: -25% vs standard)
                try:
                    ploop = _make_fwd_loop(
                        _dc.replace(fmodel, packed_tf=True), jax, jnp
                    )
                    wavp = jnp.asarray(
                        rng.standard_normal((1, 32000)).astype(np.float32))
                    embp = jnp.asarray(
                        rng.standard_normal((1, 50, 512)).astype(np.float32))
                    dt, spread, estimator = _timed(
                        ploop, fvars, wavp, embp, n_iter=20)
                    entry["latency_bs1_bf16_packed_ms"] = round(dt * 1e3, 2)
                    print(f"# {key} bs=1 bf16 packed: {dt*1e3:.2f} ms/step "
                          f"(spread {spread:.1f}%, {estimator})",
                          file=sys.stderr)
                except Exception as e:
                    print(f"# {key} packed FAILED: {type(e).__name__}",
                          file=sys.stderr)
            for bs in (1, 8):
                wav = jnp.asarray(
                    rng.standard_normal((bs, 32000)).astype(np.float32))
                emb = jnp.asarray(
                    rng.standard_normal((bs, 50, 512)).astype(np.float32))
                dt, spread, estimator = _timed(
                    floop, fvars, wav, emb, n_iter=20)
                if bs == 1:
                    entry["latency_bs1_bf16_ms"] = round(dt * 1e3, 2)
                    if ref_ms is not None:
                        entry["ref_ms"] = ref_ms
                        entry["vs_ref"] = round(ref_ms / (dt * 1e3), 1)
                else:
                    entry["throughput_bs8_bf16"] = round(bs * 2.0 / dt, 1)
                entry.setdefault("spread_pct", round(spread, 1))
                print(f"# {key} bs={bs} bf16: {dt*1e3:.2f} ms/step "
                      f"(spread {spread:.1f}%, {estimator})", file=sys.stderr)
            family_stats[key] = entry
        except Exception as e:
            print(f"# family {cfg_name} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # ---- end-to-end serving: mouth frames -> video backbone -> AVNet ----
    # The reference's inference entry always runs the video model in line
    # (reference inference.py:23-65); this measures that full pipeline.
    e2e_stats = {}
    try:
        from rtfs_tpu.models.video import make_video_model

        video_model = make_video_model(conf["videonet"])
        frames1 = jnp.zeros((1, 50, 88, 88), jnp.float32)
        vvars = jax.device_put(_host_init_params(video_model, frames1))

        def make_e2e_loop(avm):
            @partial(jax.jit, static_argnames="n_iter")
            def e2e_loop(av_v, vid_v, wav, frames, n_iter):
                def body(_, carry):
                    vemb = video_model.apply(vid_v, frames + 1e-12 * carry)
                    out = avm.apply(av_v, wav, vemb)
                    return jnp.sum(out)

                return jax.lax.fori_loop(
                    0, n_iter, body, jnp.zeros((), jnp.float32)
                )

            return e2e_loop

        # full-pipeline serving latency config: packed-TF AVNet at bs=1
        try:
            e2e_packed = make_e2e_loop(model_packed)
            wavp = jnp.asarray(
                rng.standard_normal((1, 32000)).astype(np.float32))
            framesp = jnp.asarray(
                rng.standard_normal((1, 50, 88, 88)).astype(np.float32))
            dt, spread, estimator = _timed(
                e2e_packed, variables_bf16, vvars, wavp, framesp, n_iter=20)
            e2e_stats["e2e_latency_bs1_bf16_packed_ms"] = round(dt * 1e3, 2)
            print(f"# e2e packed bs=1 bf16: {dt*1e3:.2f} ms/step "
                  f"(spread {spread:.1f}%, {estimator})", file=sys.stderr)
        except Exception as e:
            print(f"# e2e packed FAILED: {type(e).__name__}", file=sys.stderr)

        e2e_loop = make_e2e_loop(model_bf16)
        for bs in (1, 8):
            wav = jnp.asarray(
                rng.standard_normal((bs, 32000)).astype(np.float32))
            frames = jnp.asarray(
                rng.standard_normal((bs, 50, 88, 88)).astype(np.float32))
            dt, spread, estimator = _timed(
                e2e_loop, variables_bf16, vvars, wav, frames, n_iter=20)
            if bs == 1:
                e2e_stats["e2e_latency_bs1_bf16_ms"] = round(dt * 1e3, 2)
            else:
                e2e_stats["e2e_throughput_bs8_bf16"] = round(bs * 2.0 / dt, 1)
                e2e_stats["e2e_spread_pct"] = round(spread, 1)
            print(f"# e2e(video+avnet) bs={bs} bf16: {dt*1e3:.2f} ms/step "
                  f"(spread {spread:.1f}%, {estimator})", file=sys.stderr)
    except Exception as e:
        print(f"# e2e pipeline FAILED: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- training step (fwd + bwd + AdamW), f32 and bf16 ----------------
    # Chained methodology: params/opt_state thread through every iteration
    # of one fori_loop, so steps are data-dependent and cannot be
    # deduplicated by the relay.
    import optax

    from rtfs_tpu.losses import pairwise_neg_snr, pit_loss

    opt = optax.adamw(1e-3)
    train_stats = {}
    for prec, mdl, v0 in (
        ("f32", model, variables),
        ("bf16", model_bf16, variables_bf16),
    ):
        bs = 8
        wav = jnp.asarray(rng.standard_normal((bs, 32000)).astype(np.float32))
        emb = jnp.asarray(rng.standard_normal((bs, 50, 512)).astype(np.float32))
        tgt = wav[:, None] * 0.7

        def loss_fn(params, bstats):
            # train=True matches the production step (train/system.py:204)
            # and selects the training lowering of the DualPathRNN tail.
            ests, _ = mdl.apply(
                {"params": params, "batch_stats": bstats}, wav, emb,
                train=True, rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"],
            )
            return pit_loss(pairwise_neg_snr, ests, tgt)

        def step_body(params, bstats, opt_state):
            grads = jax.grad(loss_fn)(params, bstats)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        @partial(jax.jit, static_argnames="n_iter")
        def train_loop(params, bstats, opt_state, n_iter):
            def body(_, carry):
                return step_body(carry[0], bstats, carry[1])

            params, opt_state = jax.lax.fori_loop(
                0, n_iter, body, (params, opt_state)
            )
            return loss_fn(params, bstats)

        # Profiling variant: bare steps only, terminated by a tiny
        # param-leaf fetch — no trailing loss eval to contaminate the
        # per-step GB (ADVICE r3).
        @partial(jax.jit, static_argnames="n_iter")
        def prof_loop(params, bstats, opt_state, n_iter):
            def body(_, carry):
                return step_body(carry[0], bstats, carry[1])

            params, opt_state = jax.lax.fori_loop(
                0, n_iter, body, (params, opt_state)
            )
            leaf = jax.tree_util.tree_leaves(params)[0]
            return jnp.sum(leaf.astype(jnp.float32))

        bstats = v0.get("batch_stats", {})
        opt_state = opt.init(v0["params"])
        try:
            dt, spread, estimator = _timed(
                train_loop, v0["params"], bstats, opt_state, n_iter=10
            )
        except Exception as e:
            print(f"# train {prec} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        thr = bs * 2.0 / dt
        train_stats[f"train_{prec}_audio_sec_per_s"] = round(thr, 1)
        train_stats[f"train_{prec}_spread_pct"] = round(spread, 1)
        print(f"# train bs={bs} {prec}: {dt*1e3:.1f} ms/step "
              f"(median of {REPEATS}, spread {spread:.1f}%, {estimator}), "
              f"{thr:.0f} audio-s/s", file=sys.stderr)
        if prec == "bf16":
            from rtfs_tpu.utils.flops import compiled_cost

            # Cost-analyze ONE bare step (grad + update), not the timing
            # loop: the loop closes with a trailing loss eval (a full
            # extra forward), so cost(train_loop(n_iter=1)) overstates a
            # step by ~a forward — it deflated MFU and inflated the
            # roofline fraction past 100% in BENCH_r02.
            cost = compiled_cost(
                step_body, v0["params"], bstats, opt_state
            )
            if cost and np.isfinite(cost["flops"]):
                mfu = cost["flops"] / dt / V5E_PEAK_BF16_FLOPS
                train_stats["train_bf16_mfu"] = round(mfu, 4)
                train_stats["train_step_tflops"] = round(cost["flops"] / 1e12, 3)
                print(f"# train bf16 MFU {mfu*100:.1f}% "
                      f"({cost['flops']/1e12:.2f} TFLOP/step)", file=sys.stderr)
            # memory-bound model: the honest speed-of-light metric is
            # MEASURED HBM traffic (profiler per-op layout-aware bytes)
            # vs the chip's peak. XLA cost-analysis bytes overcount real
            # traffic (>100% of peak in BENCH_r02) and are not reported.
            try:
                import tempfile

                sys.path.insert(0, os.path.dirname(
                    os.path.abspath(__file__)))
                from tools.profile_train_step import parse_xplane

                logdir = tempfile.mkdtemp(prefix="rtfs_bench_prof_")
                n_prof = 10
                # compile OUTSIDE the trace: compiling through the tunnel
                # with an active profiler has crashed the process before
                float(prof_loop(v0["params"], bstats, opt_state,
                                n_iter=n_prof))
                jax.profiler.start_trace(logdir)
                float(prof_loop(v0["params"], bstats, opt_state,
                                n_iter=n_prof))
                jax.profiler.stop_trace()
                recs, async_ps, async_b, peak_gbps = parse_xplane(logdir)
                dev_ms = sum(r.dur_ps for r in recs.values()) / 1e9 / n_prof
                gb_step = (sum(r.bytes_total for r in recs.values())
                           + async_b) / 1e9 / n_prof
                achieved = gb_step / (dev_ms / 1e3)
                frac = achieved / peak_gbps if peak_gbps else float("nan")
                train_stats["train_bf16_hbm_gb_per_step"] = round(gb_step, 2)
                train_stats["train_bf16_hbm_gbps_achieved"] = round(
                    achieved, 1)
                train_stats["train_bf16_hbm_roofline_frac"] = round(frac, 3)
                # distance from the written-down algorithmic byte floor
                # (tools/analyze_step_bytes.py; docs/design.md section 10)
                try:
                    floor_path = os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "docs", "step_bytes_r04.json")
                    with open(floor_path) as fh:
                        # tier3_gb is decimal GB, same convention as gb_step
                        floor_gb = json.load(fh)["step"]["tier3_gb"]
                    train_stats["train_bf16_bytes_vs_floor"] = round(
                        gb_step / floor_gb, 3)
                except Exception:
                    pass
                print(
                    f"# train bf16 HBM (measured): {gb_step:.1f} GB/step "
                    f"-> {achieved:.0f} GB/s = {frac*100:.0f}% of peak "
                    f"{peak_gbps:.0f} GB/s", file=sys.stderr,
                )
            except Exception as e:
                print(f"# HBM roofline profile skipped: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"rtfsnet4_inference_throughput_bs{best_bs}_{best_prec}",
                "value": round(best, 1),
                "unit": "audio-sec/s/chip",
                "vs_baseline": round(best / BASELINE_AUDIO_SEC_PER_S, 2),
                "n_repeats": REPEATS,
                "spread_pct": round(best_spread, 1),
                "estimator": best_estimator,
                **latency,
                "family": family_stats,
                **e2e_stats,
                **train_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
