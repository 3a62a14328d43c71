"""AVSystem: the training system (counterpart of the reference Lightning System).

Reference ``src/system/core.py:50-232``: wraps audio+video models, runs the
frozen-video forward, computes PIT losses (neg-SNR train / neg-SI-SDR val),
clips gradients, steps the optimizer, and aggregates metrics across ranks.

TPU-native shape: ONE jitted ``train_step`` compiled over a
``jax.sharding.Mesh`` — the batch is sharded over the ``data`` axis, params
replicated; XLA inserts the gradient psum. Cross-replica BatchNorm falls out
for free: batch-stat means are global means because the batch axis is a
sharded global axis inside jit (the reference needed
``sync_batchnorm=True``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import pairwise_neg_sisdr, pairwise_neg_snr, pit_loss
from .optim import make_optimizer


def _fold_speakers(mouth):
    """(B, S, T, H, W) per-source mouths -> ((B*S, T, H, W), S).

    4-D input passes through with S=1. See ``AVSystem._forward_loss`` for
    the per-speaker extraction semantics.
    """
    if mouth.ndim == 5:
        b, s = mouth.shape[:2]
        return mouth.reshape((b * s,) + mouth.shape[2:]), s
    return mouth, 1


def _unfold_speakers(ests, n_spk: int):
    """(B*S, 1, T) per-speaker estimates -> (B, S, T)."""
    if n_spk == 1:
        return ests
    if ests.shape[1] != 1:
        raise ValueError(
            "per-source mouths (n_src>=2 dataset) require a 1-mask model "
            f"(audionet n_src=1); model emitted {ests.shape[1]} estimates"
        )
    return ests.reshape((-1, n_spk) + ests.shape[2:])


class TrainState(struct.PyTreeNode):
    """All mutable training state as one pytree (orbax-checkpointable)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    video_variables: Any  # frozen video backbone params+stats


class AVSystem:
    """Builds and owns the jitted train/val steps for an AVNet + video model.

    Args:
      model: the flax AVNet.
      video_model: frozen lip backbone (or None for audio-only).
      optimizer: optax transformation (see ``make_optimizer``).
      mesh: device mesh; if None, runs single-device un-sharded.
    """

    def __init__(
        self,
        model,
        video_model=None,
        optimizer=None,
        mesh: Optional[Mesh] = None,
        train_video_model: bool = False,
        donate_state: bool = True,
        online_mix: bool = False,
    ):
        self.model = model
        self.video_model = video_model
        self.optimizer = optimizer or make_optimizer()
        self.mesh = mesh
        self.train_video_model = train_video_model
        self.donate_state = donate_state
        # online mixture augmentation (reference core.py:96-99,184-202):
        # audio-only training path re-mixes sources across the batch.
        self.online_mix = online_mix and video_model is None
        self._train_step = None
        self._val_step = None

    # -- state ------------------------------------------------------------

    def create_state(self, rng, sample_batch,
                     video_pretrain: Optional[str] = None) -> TrainState:
        """Initialize parameters/optimizer state from a sample batch.

        ``video_pretrain``: path to a reference lip-backbone checkpoint
        (``frcnn_128_512.backbone.pth.tar``-style); loaded via
        ``utils.torch_import.load_frcnn_checkpoint`` like the reference
        (``frcnn_videomodel.py:74-76``). The backbone is REQUIRED to be
        pretrained for meaningful AV training — random init is only for
        smoke tests.
        """
        wav = sample_batch["mix"]
        video_variables = {}
        if self.video_model is not None:
            v_rng, rng = jax.random.split(rng)
            mouth = _fold_speakers(sample_batch["mouth"])[0]
            video_variables = self.video_model.init(
                {"params": v_rng}, mouth
            )
            if video_pretrain:
                from ..utils.torch_import import load_frcnn_checkpoint

                backbone = getattr(self.video_model, "backbone_type", "resnet")
                loaded = load_frcnn_checkpoint(video_pretrain, backbone)
                video_variables = {
                    "params": loaded["params"],
                    "batch_stats": loaded["batch_stats"],
                }
            mouth_emb = self.video_model.apply(video_variables, mouth)
            n_spk = _fold_speakers(sample_batch["mouth"])[1]
            if n_spk > 1:
                wav = jnp.repeat(wav, n_spk, axis=0)
        else:
            mouth_emb = None
        variables = self.model.init({"params": rng}, wav, mouth_emb)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        if self.train_video_model and self.video_model is not None:
            # joint training (reference System(train_video_model=True),
            # core.py:87-92): video params join the optimized tree as a
            # "video" subtree; frozen stats stay in video_variables.
            params = {"audio": params, "video": video_variables["params"]}
            video_variables = {
                k: v for k, v in video_variables.items() if k != "params"
            }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            video_variables=video_variables,
        )

    # -- forward/loss -----------------------------------------------------

    def _forward_loss(
        self, params, batch_stats, video_variables, batch, rng, train: bool
    ):
        if train and self.online_mix:
            from ..data.mixing import online_mixing

            mix_rng, rng = jax.random.split(rng)
            batch = online_mixing(batch, mix_rng)
        wav, targets = batch["mix"], batch["src"]
        if targets.ndim == 2:
            targets = targets[:, None]
        mouth_emb = None
        new_video_stats = None
        n_spk = 1
        if self.video_model is not None:
            # Per-source mouths (B, S, T, H, W) from the n_src>=2 dataset
            # path (dataset.py:174-179) run as per-speaker target
            # extraction: speakers fold into the batch, the mixture is
            # repeated per speaker, and estimates reshape back to
            # (B, S, T) for PIT. (The reference's n_src=2 AV path would
            # crash in its Conv3d frontend — avspeech_dataset.py:217 vs
            # frcnn_videomodel.py:62-64 — so this is a deliberate
            # completion, not a translation.)
            mouth, n_spk = _fold_speakers(batch["mouth"])
        if self.video_model is not None and self.train_video_model:
            # joint training: video params come from the optimized tree;
            # in train mode the backbone's BatchNorms use (and update)
            # batch statistics like the reference's Lightning train mode.
            vvars = {**video_variables, "params": params["video"]}
            if train:
                out = self.video_model.apply(
                    vvars, mouth, train=True,
                    mutable=["batch_stats"],
                )
                mouth_emb, mutated_v = out
                new_video_stats = mutated_v.get("batch_stats")
            else:
                mouth_emb = self.video_model.apply(vvars, mouth)
            params = params["audio"]
        elif self.video_model is not None:
            # Frozen backbone: eval-mode BN, no gradient path (params are
            # not differentiated; stop_gradient guards mixed setups).
            mouth_emb = jax.lax.stop_gradient(
                self.video_model.apply(video_variables, mouth)
            )
        model_in = jnp.repeat(wav, n_spk, axis=0) if n_spk > 1 else wav
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            ests, mutated = self.model.apply(
                variables, model_in, mouth_emb, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            ests = _unfold_speakers(ests, n_spk)
            loss = pit_loss(pairwise_neg_snr, ests, targets)
            return loss, (mutated["batch_stats"], new_video_stats)
        ests = self.model.apply(variables, model_in, mouth_emb, train=False)
        ests = _unfold_speakers(ests, n_spk)
        loss = pit_loss(pairwise_neg_sisdr, ests, targets)
        return loss, (batch_stats, None)

    # -- steps ------------------------------------------------------------

    def train_step_fn(self, state: TrainState, batch, rng):
        def loss_fn(params):
            loss, aux = self._forward_loss(
                params, state.batch_stats, state.video_variables, batch, rng,
                train=True,
            )
            return loss, aux

        (loss, (new_stats, new_video_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        video_variables = state.video_variables
        if new_video_stats is not None:
            video_variables = {
                **video_variables, "batch_stats": new_video_stats,
            }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            video_variables=video_variables,
        )
        return new_state, {"train_loss": loss}

    def val_step_fn(self, state: TrainState, batch):
        loss, _aux = self._forward_loss(
            state.params, state.batch_stats, state.video_variables, batch,
            jax.random.PRNGKey(0), train=False,
        )
        return {"val_loss": loss}

    # -- jitted, sharded entry points ------------------------------------

    def compile(self):
        """Jit the steps; with a mesh, annotate state-replicated /
        batch-sharded in/out shardings so XLA compiles the DP collectives."""
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            shd = NamedSharding(self.mesh, P("data"))
            self._train_step = jax.jit(
                self.train_step_fn,
                in_shardings=(rep, shd, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,) if self.donate_state else (),
            )
            self._val_step = jax.jit(
                self.val_step_fn, in_shardings=(rep, shd), out_shardings=rep
            )
        else:
            self._train_step = jax.jit(
                self.train_step_fn,
                donate_argnums=(0,) if self.donate_state else (),
            )
            self._val_step = jax.jit(self.val_step_fn)
        return self

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self.compile()
        return self._train_step(state, batch, rng)

    def val_step(self, state, batch):
        if self._val_step is None:
            self.compile()
        return self._val_step(state, batch)
