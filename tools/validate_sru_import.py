"""Validate rtfs_tpu's SRU semantics + importer against a LIVE ``sru`` install.

This image has no network, so CI pins SRU semantics via an independent
numpy transcription (``tests/test_sru_semantics.py``). On any machine where
``pip install sru torch`` works, this script closes the loop against the
actual package:

    python tools/validate_sru_import.py

Checks, for uni/bi x k3/k4 x 1/4-layer combos:
  1. forward parity: sru.SRU(x) == rtfs_tpu.ops.sru.SRU with params
     imported through ``convert_sru_packed`` (the rnn_lst path real
     checkpoints take), atol 1e-4.
  2. the package's default flags match what rtfs_tpu assumes
     (highway_bias=-1.0, rescale=False, use_tanh=False, layer_norm=False).

Exit code 0 = all parity checks pass.
"""

import sys

import numpy as np


def main():
    try:
        import torch
        from sru import SRU as TorchSRU
    except ImportError as e:
        print(f"sru/torch not installed ({e}); run where `pip install sru` works")
        return 2

    import inspect

    import jax
    import jax.numpy as jnp

    from rtfs_tpu.ops.sru import SRU as JaxSRU
    from rtfs_tpu.utils.torch_import import convert_sru_packed

    # --- flag-default audit -------------------------------------------------
    sig = inspect.signature(TorchSRU.__init__)
    expected = {"highway_bias": -1.0, "rescale": False, "use_tanh": False,
                "layer_norm": False}
    bad = []
    for name, want in expected.items():
        if name in sig.parameters:
            got = sig.parameters[name].default
            status = "ok" if got == want else "MISMATCH"
            if got != want:
                bad.append(name)
            print(f"default {name}={got!r} (rtfs assumes {want!r}) {status}")
        else:
            print(f"default {name}: not a parameter (check package version)")
    failures = 0

    # --- forward parity -----------------------------------------------------
    for bidirectional in (False, True):
        for num_layers in (1, 4):
            dirs = 2 if bidirectional else 1
            hidden = 16
            for d_in in (48, dirs * hidden):  # k=4 and k=3 first layers
                torch.manual_seed(0)
                m = TorchSRU(d_in, hidden, num_layers=num_layers,
                             bidirectional=bidirectional)
                m.eval()
                L, B = 23, 3
                x = np.random.default_rng(0).standard_normal(
                    (L, B, d_in)).astype(np.float32)
                with torch.no_grad():
                    ref = m(torch.from_numpy(x))[0].numpy()

                jm = JaxSRU(input_size=d_in, hidden_size=hidden,
                            num_layers=num_layers,
                            bidirectional=bidirectional, backend="scan")
                params = {}
                sd = m.state_dict()
                for l in range(num_layers):
                    w, wc, b = convert_sru_packed(
                        sd[f"rnn_lst.{l}.weight"].numpy(),
                        sd[f"rnn_lst.{l}.weight_c"].numpy(),
                        sd[f"rnn_lst.{l}.bias"].numpy(),
                        dirs=dirs,
                    )
                    params[f"weight_{l}"] = jnp.asarray(w)
                    params[f"weight_c_{l}"] = jnp.asarray(wc)
                    params[f"bias_{l}"] = jnp.asarray(b)
                out = np.asarray(
                    jm.apply({"params": params},
                             jnp.asarray(x.transpose(1, 0, 2)))
                ).transpose(1, 0, 2)
                err = np.abs(out - ref).max()
                tag = (f"bi={bidirectional} layers={num_layers} "
                       f"d_in={d_in}")
                if err < 1e-4:
                    print(f"parity {tag}: maxerr {err:.2e} ok")
                else:
                    print(f"parity {tag}: maxerr {err:.2e} FAIL")
                    failures += 1

    if failures or bad:
        print(f"FAILED: {failures} parity, {bad} flag mismatches")
        return 1
    print("all SRU parity checks passed against the live package")
    return 0


if __name__ == "__main__":
    sys.exit(main())
