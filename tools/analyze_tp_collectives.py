"""What does XLA SPMD actually insert for the DP and DP x TP meshes?

VERDICT r2 weak #7: the 4x2 dryrun passes, but there was zero evidence
about the collectives XLA inserts for the frequency-sharded TF core (the
F-axis scan under an F-shard plausibly all-gathers every DualPathRNN).
This tool compiles the REAL sharded train step (the same path
``__graft_entry__.dryrun_multichip`` runs) on the virtual 8-device CPU
mesh for (a) pure DP 8x1 and (b) DP x TP 4x2 with the TF maps sharded
(B over data, F over model), then counts and attributes every collective
op in the optimized HLO.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python tools/analyze_tp_collectives.py
Output: human-readable table on stderr + one JSON line on stdout
        (committed as TP_ANALYSIS_rXX.json).
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the container sitecustomize registers a tunneled TPU backend and wins
# over JAX_PLATFORMS; force the virtual CPU platform programmatically
jax.config.update("jax_platforms", "cpu")

COLLECTIVE_RE = re.compile(
    r"%?(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"[.\d]* = \S+ ([a-z-]+)\("
)


def build_step(n_data: int, n_model: int):
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import FrozenDict
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _host_init_params
    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.models.video import make_video_model
    from rtfs_tpu.parallel import make_mesh, replicate, shard_batch
    from rtfs_tpu.train import AVSystem, make_optimizer
    from rtfs_tpu.train.system import TrainState

    devices = jax.devices()[: n_data * n_model]
    mesh = make_mesh(n_data=n_data, n_model=n_model, devices=devices)
    conf = load_config("lrs2_RTFSNet_4_layer")
    model = build_avnet(conf)
    if n_model > 1:
        model = _dc.replace(
            model,
            tf_sharding=NamedSharding(mesh, P("data", None, "model", None)),
        )
    video_model = make_video_model(conf["videonet"])
    system = AVSystem(
        model, video_model=video_model,
        optimizer=make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
        mesh=mesh,
    )
    b = n_data
    rng = np.random.default_rng(0)
    batch = {
        "mix": rng.standard_normal((b, 3968)).astype(np.float32),
        "src": rng.standard_normal((b, 1, 3968)).astype(np.float32),
        "mouth": rng.standard_normal((b, 8, 88, 88)).astype(np.float32),
    }
    video_variables = _host_init_params(video_model, batch["mouth"], seed=1)
    mouth_emb = jax.eval_shape(
        lambda v, m: video_model.apply(v, m), video_variables, batch["mouth"]
    )
    variables = _host_init_params(
        model,
        jnp.zeros((b, 3968), jnp.float32),
        jnp.zeros(mouth_emb.shape, mouth_emb.dtype),
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
    system.compile()
    import jax.random as jrandom

    lowered = system._train_step.lower(state, sbatch,
                                       replicate(mesh, jrandom.PRNGKey(0)))
    return lowered.compile().as_text()


def analyze(hlo: str):
    counts = collections.Counter()
    sized = collections.Counter()
    by_module = collections.Counter()
    for m in re.finditer(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)[.\d]*\s*=\s*(\([^)]*\)|\S+)\s",
        hlo,
    ):
        kind, shape = m.group(1), m.group(2)
        counts[kind] += 1
        # crude element count from the shapes for a size ranking
        elems = 0
        for s in re.findall(r"\[([0-9,]*)\]", shape):
            n = 1
            for d in s.split(","):
                if d:
                    n *= int(d)
            elems += n
        sized[kind] += elems
        line_end = hlo.find("\n", m.start())
        line = hlo[m.start():line_end]
        mod = re.search(r'op_name="([^"]*)"', line)
        if mod:
            parts = [p for p in mod.group(1).split("/")
                     if not (p.startswith("jit(") or p in ("jvp(AVNet)",)
                             or p.startswith("transpose("))]
            tag = "/".join(parts[-3:])[:70] or "untagged"
        else:
            src = re.search(
                r'source_file="([^"]+)"[^"]*source_line=(\d+)', line)
            tag = (os.path.basename(src.group(1)) + ":" + src.group(2)
                   if src else "untagged")
        by_module[f"{kind} @ {tag}"] += 1
    return counts, sized, by_module


def main():
    out = {}
    for name, (nd, nm) in (("dp_8x1", (8, 1)), ("dp_tp_4x2", (4, 2))):
        hlo = build_step(nd, nm)
        counts, sized, by_module = analyze(hlo)
        print(f"# --- {name} ---", file=sys.stderr)
        for k, v in counts.most_common():
            print(f"#   {k:20s} x{v:4d}  (~{sized[k]/1e6:.2f} M elements "
                  f"total)", file=sys.stderr)
        for k, v in by_module.most_common(12):
            print(f"#     {v:4d}  {k}", file=sys.stderr)
        out[name] = {
            "counts": dict(counts),
            "total_elements_M": {k: round(v / 1e6, 3)
                                 for k, v in sized.items()},
            "top_sites": {k: v for k, v in by_module.most_common(12)},
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
