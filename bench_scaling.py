"""Weak-scaling benchmark: audio-seconds/s/chip at 1..N devices.

The BASELINE north-star asks for >=80% weak-scaling efficiency on a
multi-host v5e slice. This harness measures it wherever devices exist:
per-device batch is held constant while the mesh's ``data`` axis widens;
efficiency_N = throughput_per_chip(N) / throughput_per_chip(1).

On the single-chip dev environment it still validates the sharded-step
machinery end to end (run with XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a functional 8-way check; numbers there reflect CPU
contention, not ICI).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_n_devices(n_dev: int, per_device_batch: int, wav_len: int,
                    n_iter: int = 8, video_frames_hz: int = 25):
    import jax
    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.parallel import make_mesh, replicate, shard_batch
    from rtfs_tpu.train import AVSystem, make_optimizer
    from rtfs_tpu.train.system import TrainState
    from __graft_entry__ import _host_init_params
    from flax.core import FrozenDict

    from rtfs_tpu.models.video import make_video_model

    mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
    conf = load_config("lrs2_RTFSNet_4_layer")
    model = build_avnet(conf)
    # the REAL train.py path: frozen FRCNN lip backbone feeding the AV net
    # (train.py:88,101-104); no passthrough stand-ins.
    video_model = make_video_model(conf["videonet"])
    system = AVSystem(model, video_model=video_model,
                      optimizer=make_optimizer("adamw", lr=1e-3), mesh=mesh,
                      donate_state=False)

    b = per_device_batch * n_dev
    n_frames = max(wav_len // 640, 1)  # 25 fps vs 16 kHz
    rng = np.random.default_rng(0)
    batch = {
        "mix": rng.standard_normal((b, wav_len)).astype(np.float32) * 0.1,
        "src": rng.standard_normal((b, 1, wav_len)).astype(np.float32) * 0.1,
        "mouth": rng.standard_normal(
            (b, n_frames, 88, 88)).astype(np.float32),
    }
    mouth = jnp.zeros((b, n_frames, 88, 88))
    video_variables = _host_init_params(video_model, mouth, seed=1)
    emb_shape = jax.eval_shape(
        lambda v, m: video_model.apply(v, m), video_variables, mouth
    )
    variables = _host_init_params(
        model, jnp.zeros((b, wav_len)), jnp.zeros(emb_shape.shape)
    )

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=system.optimizer.init(variables["params"]),
        video_variables=video_variables,
    )
    state = replicate(mesh, state)
    sbatch = shard_batch(mesh, batch)
    rng_dev = replicate(mesh, jax.random.PRNGKey(0))

    system.compile()
    # Collective-volume audit (VERDICT r3 #7): count the collectives XLA
    # SPMD inserted into THIS width's compiled module and their total
    # element volume — the per-device communication cost that determines
    # scaling, measurable even on a virtual mesh.
    coll = {}
    try:
        import os
        import sys as _sys

        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.analyze_tp_collectives import analyze

        hlo = system._train_step.lower(
            state, sbatch, replicate(mesh, jax.random.PRNGKey(0))
        ).compile().as_text()
        counts, sized, _ = analyze(hlo)
        coll = {
            "collective_ops": sum(counts.values()),
            "collective_M_elements_per_device": round(
                sum(sized.values()) / 1e6, 3
            ),
        }
    except Exception as e:  # audit is best-effort; never kill the bench
        coll = {"collective_audit_error": f"{type(e).__name__}: {e}"}

    state, m = system.train_step(state, sbatch, rng_dev)  # compile
    float(m["train_loss"])  # host fetch: forces real completion
    t0 = time.perf_counter()
    float(system.train_step(state, sbatch, rng_dev)[1]["train_loss"])
    overhead = time.perf_counter() - t0  # single-step incl. dispatch+fetch
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, m = system.train_step(state, sbatch, rng_dev)
    # fetching the LAST loss forces the whole chained sequence to finish
    # (state threads through every step; block_until_ready alone has been
    # observed returning early on relay-backed devices)
    float(m["train_loss"])
    total = time.perf_counter() - t0
    if total > 2 * overhead:
        dt = (total - overhead) / max(n_iter - 1, 1)
    else:
        # contended-host noise made the single-step "overhead" sample
        # comparable to the whole loop; fall back to the plain mean
        dt = total / n_iter
    audio_sec = b * (wav_len / 16000.0)
    return audio_sec / dt / n_dev, coll  # (audio-sec/s/chip, audit)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per-device-batch", type=int, default=2)
    parser.add_argument("--wav-len", type=int, default=16000)
    parser.add_argument("--devices", type=int, nargs="*", default=None)
    parser.add_argument("--n-iter", type=int, default=8)
    parser.add_argument(
        "--cpu-mesh", type=int, default=0, metavar="N",
        help="force an N-virtual-device CPU platform (sitecustomize may "
             "override JAX_PLATFORMS, so the env var alone is not enough)",
    )
    args = parser.parse_args()

    if args.cpu_mesh:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{args.cpu_mesh}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    n_total = jax.device_count()
    dev_counts = args.devices or sorted(
        {1, 2, n_total} & set(range(1, n_total + 1))
    )
    results = {}
    audits = {}
    for n in dev_counts:
        thr, coll = bench_n_devices(n, args.per_device_batch, args.wav_len,
                                    n_iter=args.n_iter)
        results[n] = thr
        audits[str(n)] = coll
        print(f"# {n} devices: {thr:.1f} audio-sec/s/chip, "
              f"collectives: {coll}", flush=True)
    base = results[min(results)]
    eff = {n: results[n] / base for n in results}
    platform = jax.devices()[0].platform
    out = {
        "metric": "train_weak_scaling_efficiency",
        "value": round(min(eff.values()), 3),
        "unit": "fraction",
        "platform": platform,
        "per_chip_throughput": {
            str(k): round(v, 3) for k, v in results.items()
        },
        # On a virtual CPU mesh all "devices" share the same cores, so
        # per-chip weak scaling CANNOT hold by construction; the meaningful
        # functional check there is that TOTAL throughput stays ~flat while
        # the sharded step runs correctly at every width.
        "total_speedup": {
            str(n): round(results[n] * n / base, 3) for n in results
        },
        # per-device collective volume per step at each width: the DP
        # gradient all-reduce volume should stay ~constant per device
        # (ring all-reduce), which is what makes >=80% weak scaling
        # plausible on real ICI
        "collectives_per_device": audits,
    }
    if platform == "cpu":
        out["note"] = ("virtual CPU mesh: functional validation only; "
                       "per-chip efficiency reflects core sharing, not ICI")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
