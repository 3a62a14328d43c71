"""Cross-backend full-model parity: TPU Pallas path vs CPU lax.scan path.

The CPU test suite proves rtfs_tpu == the torch reference (golden tests),
and interpret-mode tests prove the Pallas kernels == lax.scan — but both
run on CPU. This tool closes the remaining gap with evidence from the
real chip: the SAME flagship-model parameters produce the SAME waveform
through the TPU executable (fused Pallas SRU kernels, MXU matmuls) as
through the CPU executable (lax.scan backend).

Run on a machine with a TPU attached:

    python tools/tpu_parity_check.py [--config lrs2_RTFSNet_4_layer]

Prints one JSON line: max |Δ| between backends on the output waveform,
the output scale, and pass/fail at a tolerance that accounts for TPU
matmul accumulation-order differences (f32 everywhere; default 2e-3 on
unit-scale waveforms).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_cpu(config: str, out_path: str) -> None:
    """Child process: CPU backend, scan SRU; saves params + output."""
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from flax import serialization
from rtfs_tpu.config import build_avnet, load_config

conf = load_config({config!r})
model = build_avnet(conf)
rng = np.random.default_rng(0)
wav = rng.standard_normal((2, 32000)).astype(np.float32) * 0.1
emb = rng.standard_normal((2, 50, 512)).astype(np.float32) * 0.5
variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav),
                       jnp.asarray(emb))
out = model.apply(variables, jnp.asarray(wav), jnp.asarray(emb))
np.savez({out_path!r}, out=np.asarray(out), wav=wav, emb=emb)
with open({out_path!r} + ".msgpack", "wb") as f:
    f.write(serialization.to_bytes(variables))
print("cpu reference done", out.shape)
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="lrs2_RTFSNet_4_layer")
    parser.add_argument("--tol", type=float, default=2e-3,
                        help="relative tolerance at matmul precision "
                             "'highest' (kernel correctness)")
    parser.add_argument("--tol-default", type=float, default=0.02,
                        help="relative tolerance at matmul precision "
                             "'default' (bf16-truncated precision policy)")
    args = parser.parse_args()

    tmpdir = tempfile.TemporaryDirectory(prefix="tpu_parity_")
    tmp = os.path.join(tmpdir.name, "ref.npz")
    _run_cpu(args.config, tmp)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from rtfs_tpu.config import build_avnet, load_config

    platform = jax.devices()[0].platform
    data = np.load(tmp)
    conf = load_config(args.config)
    model = build_avnet(conf)
    wav = jnp.asarray(data["wav"])
    emb = jnp.asarray(data["emb"])
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), wav, emb)
    with open(tmp + ".msgpack", "rb") as f:
        variables = serialization.from_bytes(template, f.read())
    variables = jax.device_put(variables)

    ref = jnp.asarray(data["out"])
    scale = float(jnp.max(jnp.abs(ref)))

    def rel_diff(precision):
        with jax.default_matmul_precision(precision):
            out = jax.jit(model.apply)(variables, wav, emb)
        # reductions on-device: device->host quirks on relay backends
        return float(jnp.max(jnp.abs(out - ref))) / max(scale, 1e-12)

    # "default": TPU matmuls truncate f32 inputs to bf16 — the production
    # speed/accuracy point; deviation here is precision POLICY, not kernel
    # correctness. "highest": full f32 passes — deviation here would be an
    # actual kernel bug, so it gets the tight tolerance.
    rel_default = rel_diff("default")
    rel_highest = rel_diff("highest")
    ok = rel_highest < args.tol and rel_default < args.tol_default
    print(json.dumps({
        "check": "tpu_vs_cpu_full_model_forward",
        "config": args.config,
        "device_platform": platform,
        "output_scale": scale,
        "rel_diff_default_precision": rel_default,
        "rel_diff_highest_precision": rel_highest,
        "tol_highest": args.tol,
        "tol_default": args.tol_default,
        "pass": bool(ok),
    }))
    tmpdir.cleanup()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
