"""Training entry: ``python train.py --conf-dir rtfs_tpu/configs/X.yaml``.

Counterpart of the reference ``train.py:24-179``: loads the two-level YAML
config (argparse overrides merge on top), builds datasets + frozen video
backbone + AVNet + optimizer, and runs the epoch loop with validation,
ReduceLROnPlateau / manual LR divide, early stopping, orbax top-5
checkpoints + resume, and a final self-describing best-model export.

Scale-out is the TPU-native path: one jitted step over a
``jax.sharding.Mesh`` data axis (all local devices by default); multi-host
runs call ``jax.distributed.initialize()`` first (``--distributed``).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_datasets(conf):
    from rtfs_tpu.data import AVSpeechDataset, SyntheticAVDataset

    data = conf["data"]
    if data.get("synthetic"):
        n = data.get("synthetic_samples", 64)
        train_set = SyntheticAVDataset(n_samples=n, n_src=conf["audionet"]["n_src"])
        val_set = SyntheticAVDataset(n_samples=max(n // 4, 4), seed=123,
                                     n_src=conf["audionet"]["n_src"])
        return train_set, val_set
    audio_only = not conf.get("videonet")
    train_set = AVSpeechDataset(
        data["train_dir"],
        n_src=conf["audionet"]["n_src"],
        sample_rate=data["sample_rate"],
        segment=data["segment"],
        normalize_audio=data.get("normalize_audio", False),
        audio_only=audio_only,
    )
    val_set = AVSpeechDataset(
        data["valid_dir"],
        n_src=conf["audionet"]["n_src"],
        sample_rate=data["sample_rate"],
        segment=data["segment"],
        normalize_audio=data.get("normalize_audio", False),
        audio_only=audio_only,
    )
    return train_set, val_set


def main(conf, args):
    import jax
    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet
    from rtfs_tpu.models.video import make_video_model
    from rtfs_tpu.parallel import make_mesh, replicate, shard_batch
    from rtfs_tpu.train import (
        AVSystem,
        EpochDivideLR,
        ReduceLROnPlateau,
        make_optimizer,
    )
    from rtfs_tpu.train.checkpoints import CheckpointManager, export_model
    from rtfs_tpu.train.optim import get_lr, set_lr

    if args.distributed:
        # Multi-host init. On TPU pods the coordinator/process topology is
        # auto-detected; elsewhere (and in the 2-process CPU equivalence
        # test, tests/test_multihost.py) it is passed explicitly. CPU
        # cross-process collectives ride gloo.
        if jax.config.jax_platforms == "cpu" or args.cpu:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        kwargs = {}
        if args.coordinator:
            kwargs = dict(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        jax.distributed.initialize(**kwargs)

    exp_dir = os.path.join(
        conf["log"].get("path", "log/tmp"), conf["log"]["exp_name"]
    )
    os.makedirs(exp_dir, exist_ok=True)
    if jax.process_index() == 0:
        with open(os.path.join(exp_dir, "conf.yaml"), "w") as f:
            import yaml

            from rtfs_tpu.utils.code_version import code_version

            # pin the framework code state alongside the config (reference
            # snapshots src/models into the exp dir instead, train.py:95)
            yaml.safe_dump({**conf, "code_version": code_version()}, f)

    train_set, val_set = build_datasets(conf)
    model = build_avnet(conf)
    # audio-only training (reference System(video_model=None),
    # core.py:84-85,94-107): empty/absent videonet group disables the
    # video path and the dataset skips mouth loading.
    audio_only = not conf.get("videonet")
    video_model = None if audio_only else make_video_model(conf["videonet"])

    optim_conf = conf["optim"]
    optimizer = make_optimizer(
        optim_conf.get("optimizer", "adamw"),
        lr=optim_conf.get("lr", 1e-3),
        weight_decay=optim_conf.get("weight_decay", 0.0),
        clip_grad_norm=5.0,
    )

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    tconf = conf["training"]
    system = AVSystem(
        model, video_model=video_model, optimizer=optimizer, mesh=mesh,
        online_mix=tconf.get("online_mix", False),
        train_video_model=tconf.get("train_video_model", False),
    )

    # Per-host batch: each host feeds its local devices; the global batch
    # is host_batch * num_hosts (reference: DDP per-rank batches).
    batch_size = tconf["batch_size"]
    num_hosts = jax.process_count()
    host_batch = batch_size * jax.local_device_count()
    global_batch = host_batch * num_hosts

    sample = next(train_set.batches(host_batch, shuffle=False))
    sample.pop("key", None)
    rng = jax.random.PRNGKey(args.seed)
    pretrain = (conf.get("videonet") or {}).get("pretrain")
    if pretrain and not os.path.exists(pretrain):
        print(f"WARNING: videonet.pretrain={pretrain} not found; the frozen "
              "lip backbone will be RANDOMLY initialized (smoke mode)")
        pretrain = None
    state = system.create_state(rng, sample, video_pretrain=pretrain)

    ckpt = CheckpointManager(exp_dir, top_k=5)
    start_epoch = 0
    if args.checkpoint:
        # explicit resume: epoch number, other-run path, or path@epoch
        # (reference resumes from an explicit ckpt path, train.py:148)
        from rtfs_tpu.train.checkpoints import resolve_checkpoint_spec

        src, step = resolve_checkpoint_spec(args.checkpoint, ckpt)
        restored = src.restore(state, step)
        if restored is None:
            raise FileNotFoundError(
                f"--checkpoint={args.checkpoint!r}: no checkpoint found"
            )
        state = restored
        start_epoch = int(step) + 1
        print(f"resumed from epoch {step} ({args.checkpoint})")
    elif ckpt.latest_step() is not None:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = int(ckpt.latest_step()) + 1
            print(f"resumed from epoch {start_epoch - 1}")

    if mesh is not None:
        state = replicate(mesh, state)

    plateau = (
        ReduceLROnPlateau(
            factor=conf["sche"].get("factor", 0.5),
            patience=conf["sche"].get("patience", 10),
        )
        if tconf.get("half_lr")
        else None
    )
    divide = EpochDivideLR(
        base_lr=optim_conf.get("lr", 1e-3),
        divide_by=tconf.get("divide_lr_by"),
        period=conf["sche"].get("patience", 0) or 0,
    )

    # process-0-only experiment artifacts (reference: rank-0 logging)
    metrics_log = open(
        os.path.join(exp_dir, "metrics.jsonl")
        if jax.process_index() == 0 else os.devnull, "a",
    )
    from rtfs_tpu.utils.tb_writer import SummaryWriter

    tb = SummaryWriter(os.path.join(exp_dir, "tb")) if \
        jax.process_index() == 0 else None
    best_val = float("inf")
    bad_epochs = 0
    patience = 15 if tconf.get("early_stop") else 10**9
    host_id = jax.process_index()

    def place(batch):
        """Host-local batch -> device (sharded on the mesh, else default)."""
        if mesh is None:
            # async host->HBM transfer; overlaps the running step via the
            # loader's one-batch staging
            return jax.device_put(batch)
        if num_hosts == 1:
            return shard_batch(mesh, batch)
        # multi-host: each host contributes its local shard of the global
        # batch (jax.make_array_from_process_local_data is the sanctioned
        # cross-process assembly path)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("data"))
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )

    # Threaded decode-ahead + device prefetch (the reference used 8
    # DataLoader workers, train.py:44-52).
    from rtfs_tpu.data.loader import PrefetchLoader

    num_workers = tconf.get("num_workers", 8)
    train_loader = PrefetchLoader(
        train_set, host_batch, num_workers=num_workers, place=place
    )
    val_loader = PrefetchLoader(
        val_set, host_batch, num_workers=num_workers, place=place
    )

    for epoch in range(start_epoch, tconf["epochs"]):
        t0 = time.time()
        train_losses = []
        for batch in train_loader.epoch(
            seed=args.seed, epoch=epoch,
            host_id=host_id, num_hosts=num_hosts,
        ):
            batch.pop("key", None)
            rng, step_rng = jax.random.split(rng)
            state, m = system.train_step(state, batch, step_rng)
            train_losses.append(m["train_loss"])
        train_loss = float(jnp.mean(jnp.stack(train_losses)))

        val_losses = []
        for batch in val_loader.epoch(
            shuffle=False, host_id=host_id, num_hosts=num_hosts
        ):
            batch.pop("key", None)
            val_losses.append(system.val_step(state, batch)["val_loss"])
        val_loss = float(jnp.mean(jnp.stack(val_losses)))

        lr = get_lr(state.opt_state)
        if plateau is not None:
            new_lr = plateau.step(val_loss, lr)
        else:
            new_lr = lr
        new_lr = divide.lr_for_epoch(epoch, new_lr)
        if new_lr != lr:
            state = state.replace(opt_state=set_lr(state.opt_state, new_lr))
            print(f"lr -> {new_lr:.2e}")

        row = {
            "epoch": epoch,
            "train_loss": train_loss,
            "val_loss": val_loss,
            "train_sisnr": -train_loss,
            "val_sisnr": -val_loss,
            "learning_rate": lr,
            "secs": round(time.time() - t0, 1),
        }
        print(json.dumps(row))
        metrics_log.write(json.dumps(row) + "\n")
        metrics_log.flush()
        if tb is not None:
            # scalar parity with the reference logger (core.py:121-141)
            tb.add_scalar("train_loss", train_loss, epoch)
            tb.add_scalar("val_loss", val_loss, epoch)
            tb.add_scalar("train_sisnr", -train_loss, epoch)
            tb.add_scalar("val_sisnr", -val_loss, epoch)
            tb.add_scalar("learning_rate", lr, epoch)

        # all processes must enter the save (orbax coordinates multi-host
        # writes internally with a barrier; process 0 writes the metadata
        # and fully-replicated arrays)
        ckpt.save(epoch, jax.tree.map(np.asarray, state), val_loss)

        if val_loss < best_val - 1e-9:
            best_val = val_loss
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs > patience:
                print(f"early stopping at epoch {epoch}")
                break

    # export best model — the orbax restore is collective (all processes
    # participate); only the bundle write is process-0
    best = ckpt.best_step()
    if best is not None:
        best_state = ckpt.restore(jax.tree.map(np.asarray, state), best)
        if jax.process_index() == 0:
            params = best_state.params
            video_variables = best_state.video_variables
            if (isinstance(params, dict)
                    and set(params.keys()) == {"audio", "video"}):
                # joint-trained run: re-fold video params into the video
                # variables so the exported bundle matches the frozen-
                # backbone layout test.py/inference.py expect
                video_variables = {
                    **(video_variables or {}), "params": params["video"],
                }
                params = params["audio"]
            export_model(
                os.path.join(exp_dir, "best_model.bin"),
                conf["audionet"],
                params,
                best_state.batch_stats,
                video_variables,
                infos={"best_epoch": int(best), "val_loss": best_val},
            )
            print(f"exported best model (epoch {best}) to {exp_dir}/best_model.bin")

    if jax.process_count() > 1:
        # all processes reach shutdown together: without this, workers
        # exit while process 0 is still exporting and the coordination
        # service's shutdown barrier trips
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("rtfs_train_end")


if __name__ == "__main__":
    from rtfs_tpu.config import load_config
    from rtfs_tpu.utils.parser import parse_overrides

    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", default="rtfs_tpu/configs/lrs2_RTFSNet_4_layer.yaml")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (omit on TPU pods "
                             "where topology is auto-detected)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args, overrides = parser.parse_known_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    conf = load_config(args.conf_dir)
    conf = parse_overrides(conf, overrides)
    main(conf, args)
