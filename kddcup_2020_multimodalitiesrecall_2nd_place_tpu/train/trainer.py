"""Data-parallel training engine (jit over a mesh; XLA inserts the grad
all-reduce over ICI -- the TPU-native replacement for the reference's tower
loops + ``average_gradients``: ``run_pretraining_predict_score.py:176-231``,
``train_normal.py:59-98``).

Per-model recipes mirror the reference drivers:

* ImageBERT-A: BERT-Adam (poly decay + warmup), global-norm clip 1.0, NSP
  loss (+ optional MLM and Multi-Similarity terms used in its fine-tunes).
* ImageBERT-B: plain Adam with 0.94/2500 staircase decay, per-value clip
  +-1, AM-softmax loss, EMA 0.997 over all trainables
  (``train_normal.py:133-194``).
* LXMERT: Adam, cross-entropy on logit_fc (+ optional MLM).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import ModelSpec, Precision, heads
from ..parallel.mesh import DATA_AXIS, batch_sharding, make_mesh, replicated
from .distill import AUX_PREFIXES, HOST_ONLY_KEYS
from .ema import EmaState, ema_init, ema_update
from .losses import ms_loss
from .optim import (
    bert_adamw,
    clip_by_global_norm,
    clip_by_value,
    exponential_staircase_schedule,
    grad_group_norms,
    polynomial_warmup_schedule,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState | None
    step: jax.Array


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 2e-5
    num_train_steps: int = 100_000
    num_warmup_steps: int = 30_000
    optimizer: str = "bert_adamw"  # or "adam_staircase"
    clip: str = "global_norm"  # "global_norm" | "value" | "none"
    clip_value: float = 1.0
    ema_decay: float | None = None
    ms_loss_weight: float = 0.0
    mlm_loss_weight: float = 0.0
    # LXMERT --taskAMSloss: train the cosine logit_W head instead of logit_fc
    # (tasks/kdd_model.py:207-210; the AM formulation follows the B head,
    # the lxmert training driver itself is not shipped)
    am_loss: bool = False
    # B word-match auxiliary loss, default off = the reference's
    # commented-out state (model_triple.py:207-210)
    word_match_loss_weight: float = 0.0
    # per-layer-group pre/post-clip grad-norm metrics, the reference's
    # do_summaries path (clip_by_global_norm_summary,
    # run_pretraining_predict_score.py:234-258); off by default like the
    # reference's flag
    grad_summaries: bool = False
    # teacher -> student distillation (train/distill.py, no reference
    # counterpart): when distill_weight > 0 and the batch carries
    # teacher_prob, total = hard_loss_weight * family_loss
    #                       + distill_weight * T^2-softened soft CE.
    # hard_loss_weight = 0 skips the family loss entirely (pure-soft
    # distillation on unlabeled pairs).
    distill_weight: float = 0.0
    distill_temperature: float = 1.0
    hard_loss_weight: float = 1.0


def recipe_for(model_name: str) -> TrainConfig:
    if model_name == "imagebert_a":
        return TrainConfig(
            learning_rate=2e-5,
            optimizer="bert_adamw",
            clip="global_norm",
        )
    if model_name in ("imagebert_b", "imagebert_c"):
        return TrainConfig(
            learning_rate=2e-5,
            optimizer="adam_staircase",
            clip="value",
            ema_decay=0.997,
        )
    if model_name == "lxmert":
        return TrainConfig(learning_rate=1e-4, optimizer="bert_adamw", clip="global_norm")
    if model_name == "two_tower":
        # retrieval stage (no reference counterpart): InfoNCE over aligned
        # positive rows, so no warmup-heavy BERT schedule needed
        return TrainConfig(
            learning_rate=1e-4,
            optimizer="bert_adamw",
            num_warmup_steps=1000,
            clip="global_norm",
        )
    raise ValueError(model_name)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.optimizer == "bert_adamw":
        sched = polynomial_warmup_schedule(
            tc.learning_rate, tc.num_train_steps, tc.num_warmup_steps
        )
        return bert_adamw(sched)
    if tc.optimizer == "adam_staircase":
        sched = exponential_staircase_schedule(tc.learning_rate)
        return optax.adam(sched)
    raise ValueError(tc.optimizer)


def make_loss_fn(model: ModelSpec, tc: TrainConfig, precision: Precision) -> Callable:
    name = model.name
    if tc.distill_weight and name == "two_tower":
        raise ValueError("distillation targets the cross-encoder scorers")

    def mlm_term(params, out, batch, seq_key: str):
        """Tied-embedding MLM CE over masked text positions
        (run_pretraining's cls/predictions path, :433-476; for LXMERT the
        ``cls`` BertPreTrainingHeads of tasks/kdd_model.py:177-181)."""
        pos = batch["masked_lm_positions"]  # [B, P]
        hidden = jnp.take_along_axis(out[seq_key], pos[..., None], axis=1)
        logits = heads.mlm_logits(
            params["cls"]["predictions"],
            hidden,
            params["bert"]["embeddings"]["word_embeddings"],
            precision,
        )
        return heads.mlm_loss(logits, batch["masked_lm_ids"], batch["masked_lm_weights"])

    # pure-soft distillation (hard_loss_weight=0) never touches the family
    # loss -- a static decision, so XLA never builds the dead hard-loss graph
    compute_hard = not (tc.distill_weight and tc.hard_loss_weight == 0.0)

    def loss_fn(params, batch, rng):
        model_batch = {
            k: v for k, v in batch.items() if not k.startswith(AUX_PREFIXES)
        }
        apply_kwargs = {}
        if name == "lxmert" and tc.am_loss:
            apply_kwargs["use_am_head"] = True
        out = model.apply(
            params, model_batch, model.config, precision, rng=rng, **apply_kwargs
        )
        metrics = {}
        if name == "two_tower":
            from ..models.two_tower import contrastive_loss

            loss, tower_metrics = contrastive_loss(
                out["q_emb"],
                out["p_emb"],
                model.config.temperature,
                group_ids=batch.get("query_group"),
            )
            metrics.update(tower_metrics)
            metrics["loss"] = loss
            # in-batch positives carry no 0/1 labels; report retrieval
            # accuracy instead of the pairwise-classifier accuracy below
            return loss, metrics
        if not compute_hard:
            loss = jnp.float32(0.0)
        elif name == "imagebert_a":
            loss = heads.nsp_loss(
                params["cls"]["seq_relationship"], out["pooled"], batch["labels"]
            )
            if tc.ms_loss_weight:
                loss = loss + tc.ms_loss_weight * ms_loss(batch["labels"], out["pooled"])
            if tc.mlm_loss_weight and "masked_lm_positions" in batch:
                mlm = mlm_term(params, out, batch, "sequence")
                metrics["mlm_loss"] = mlm
                loss = loss + tc.mlm_loss_weight * mlm
        elif name in ("imagebert_b", "imagebert_c"):
            loss = heads.am_loss(
                params["cls"]["seq_relationship"], out["pooled"], batch["labels"]
            )
            if tc.word_match_loss_weight and "word_match_labels" in batch:
                wm = heads.word_match_loss(
                    params["kdd_query_match"],
                    out["sequence"],
                    batch["word_match_labels"],
                    batch["word_match_weights"],
                    precision,
                )
                metrics["word_match_loss"] = wm
                loss = loss + tc.word_match_loss_weight * wm
        elif name == "lxmert":
            if tc.am_loss:
                # out["logit"] are cosines from the logit_W head
                logits = heads.am_margin_logits(
                    jnp.clip(out["logit"].astype(jnp.float32), -1.0, 1.0),
                    batch["labels"],
                )
            else:
                logits = out["logit"]
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            one_hot = jax.nn.one_hot(batch["labels"], 2, dtype=jnp.float32)
            loss = -jnp.mean(jnp.sum(one_hot * log_probs, axis=-1))
            if tc.mlm_loss_weight and "masked_lm_positions" in batch:
                mlm = mlm_term(params, out, batch, "lang")
                metrics["mlm_loss"] = mlm
                loss = loss + tc.mlm_loss_weight * mlm
        else:
            raise ValueError(name)
        if tc.distill_weight and "teacher_prob" in batch:
            from .distill import distill_soft_ce, match_logodds

            s = match_logodds(name, params, out, model_batch)
            d = distill_soft_ce(
                s,
                batch["teacher_prob"],
                tc.distill_temperature,
                batch.get("teacher_weight"),
            )
            metrics["distill_loss"] = d
            loss = tc.hard_loss_weight * loss + tc.distill_weight * d
        preds = jnp.argmax(out["probs"], axis=-1)
        metrics["accuracy"] = jnp.mean((preds == batch["labels"]).astype(jnp.float32))
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


class Trainer:
    def __init__(
        self,
        model: ModelSpec,
        tc: TrainConfig | None = None,
        mesh: Mesh | None = None,
        precision: Precision = Precision.bf16(),
    ):
        self.model = model
        self.tc = tc if tc is not None else recipe_for(model.name)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.precision = precision
        self.tx = make_optimizer(self.tc)
        self._loss_fn = make_loss_fn(model, self.tc, precision)
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated(self.mesh)

        tc_ = self.tc

        # The step is deliberately TWO jitted programs (loss+grad, then
        # clip+optimizer+EMA) rather than one. Measured on v5e: each phase
        # alone is fast (LXMERT grads 0.52 s at B=1024, optimizer 17 ms)
        # but the merged program degenerates -- ImageBERT-A 4.1 s/step,
        # LXMERT 161 s/step -- an XLA scheduling/liveness pathology when the
        # rematerialised backward and the whole-state optimizer update share
        # one program. The split costs one extra dispatch and keeps the
        # 440 MB grads on-device between the phases.
        @jax.jit
        def _grads(params, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
                params, batch, rng
            )
            return grads, metrics

        @partial(jax.jit, donate_argnums=(0, 1))
        def _apply(state: TrainState, grads):
            metrics = {}
            if tc_.grad_summaries:
                for g, n in grad_group_norms(grads).items():
                    metrics[f"grad_norm_pre_clip/{g}"] = n
            if tc_.clip == "global_norm":
                grads, gnorm = clip_by_global_norm(grads, tc_.clip_value)
                metrics["grad_norm"] = gnorm
            elif tc_.clip == "value":
                grads = clip_by_value(grads, tc_.clip_value)
            if tc_.grad_summaries and tc_.clip != "none":
                for g, n in grad_group_norms(grads).items():
                    metrics[f"grad_norm_post_clip/{g}"] = n
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = (
                ema_update(state.ema, params, tc_.ema_decay)
                if state.ema is not None
                else None
            )
            return TrainState(params, opt_state, ema, state.step + 1), metrics

        def _step(state: TrainState, batch, rng):
            grads, metrics = _grads(state.params, batch, rng)
            state, apply_metrics = _apply(state, grads)
            metrics.update(apply_metrics)
            return state, metrics

        self._step = _step

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.model.init_params(rng)
        if self.tc.word_match_loss_weight and "kdd_query_match" not in params:
            # auxiliary head lives outside the checkpoint schema; created
            # only when the (default-off) word-match loss is enabled
            params = dict(params)
            params["kdd_query_match"] = heads.word_match_head_init(
                jax.random.fold_in(rng, 1), self.model.config
            )
        params = jax.device_put(params, self._replicated)
        opt_state = jax.device_put(self.tx.init(params), self._replicated)
        ema = ema_init(params) if self.tc.ema_decay else None
        return TrainState(params, opt_state, ema, jnp.zeros((), jnp.int32))

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array):
        """``batch`` holds this process's local rows; multi-host runs
        assemble the global data-sharded batch without cross-host copies
        (parallel/distributed.py), single-host is a plain device_put."""
        from ..parallel.distributed import global_batch_from_local

        host_batch = {k: v for k, v in batch.items() if k not in HOST_ONLY_KEYS}
        return self._step(state, global_batch_from_local(self.mesh, host_batch), rng)

    def eval_params(self, state: TrainState):
        return state.ema.shadow if state.ema is not None else state.params
