"""Teacher -> student distillation for the serving path.

No reference counterpart: the reference serves a 4-model ensemble
(``code/main.py:59``, weights 0.2/0.2/0.3/0.3) at 12-layer depth per
scorer. Distillation compresses that ensemble (or any single scorer) into
one shallower student of the same family, trading a training run for a
~(12/L)x serving-throughput multiplier on TPU -- the measured path past
the 50k pairs/s/chip north star (docs/BENCH.md: throughput scales with
encoder depth; int8 is shape-gated at this family's widths).

Two teacher modes, one loss:

* **Offline** (``TeacherScores``): soft targets come from reference-format
  score files -- any single scorer's output or several fused with the
  ensemble weights. This is how a student distils the *ensemble*: the
  (query_id, product_id) join needs no teacher forward pass.
* **Live** (``LiveTeacher``): a full-depth teacher checkpoint runs in
  serving mode (fed label = 1, like testB scoring:
  ``evaluate_normal.py:240-243``) on every batch. Works with the
  hard-negative sampler, whose sampled pairs exist in no score file.

The loss is temperature-softened binary soft-target cross-entropy on the
match log-odds (the two-class heads reduce to one log-odds scalar), scaled
by T^2 so gradient magnitude is temperature-invariant (Hinton et al. 2015).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ensemble.fusion import ScoreTable, load_csv_scores, load_tsv_scores

_EPS = 1e-6

# keys that never feed a model forward pass
HOST_ONLY_KEYS = ("product_id", "query_id", "valid")
AUX_PREFIXES = ("masked_lm", "word_match", "teacher_")


def model_batch_of(batch: dict) -> dict:
    return {
        k: v
        for k, v in batch.items()
        if k not in HOST_ONLY_KEYS and not k.startswith(AUX_PREFIXES)
    }


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def teacher_logodds(probs):
    """Match-probability -> log-odds, clipped away from the saturated ends
    (score files quantise near 0/1; the clip bounds the soft target's
    implied logit rather than sending it to +-inf)."""
    p = jnp.clip(jnp.asarray(probs, jnp.float32), _EPS, 1.0 - _EPS)
    return jnp.log(p) - jnp.log1p(-p)


def distill_soft_ce(
    student_logodds: jax.Array,
    teacher_probs: jax.Array,
    temperature: float = 1.0,
    weights: jax.Array | None = None,
) -> jax.Array:
    """T^2-scaled soft binary cross-entropy between temperature-softened
    teacher and student match distributions.

    With x = s/T and pT = sigmoid(t/T):  CE = softplus(x) - pT * x
    (the stable form of -[pT log sig(x) + (1-pT) log sig(-x)]).
    """
    t = teacher_logodds(teacher_probs)
    x = student_logodds.astype(jnp.float32) / temperature
    p_t = jax.nn.sigmoid(t / temperature)
    ce = jax.nn.softplus(x) - p_t * x
    ce = ce * (temperature**2)
    if weights is None:
        return jnp.mean(ce)
    w = weights.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def match_logodds(model_name: str, params, out: dict, batch: dict) -> jax.Array:
    """The student's serving-mode match log-odds, per family.

    Serving mode means the B/C AM-softmax margin is applied at the fed
    label 1 (the testB convention, ``evaluate_normal.py:240-243``) no
    matter what hard label the sampler attached -- the teacher's target
    probabilities were produced the same way.
    """
    from ..models import heads

    if model_name == "imagebert_a":
        logits = heads.nsp_logits(params["cls"]["seq_relationship"], out["pooled"])
    elif model_name in ("imagebert_b", "imagebert_c"):
        cos = heads.am_cosines(params["cls"]["seq_relationship"], out["pooled"])
        logits = heads.am_margin_logits(cos, jnp.ones_like(batch["labels"]))
    elif model_name == "lxmert":
        logits = out["logit"].astype(jnp.float32)
    else:
        raise ValueError(f"no distillation log-odds for {model_name!r}")
    return logits[:, 1] - logits[:, 0]


# ---------------------------------------------------------------------------
# student init
# ---------------------------------------------------------------------------


def evenly_spaced_layers(num_student: int, num_teacher: int) -> tuple[int, ...]:
    """Teacher layer indices for each student layer: evenly spaced through
    the stack, always ending on the teacher's last layer (the standard
    DistilBERT-style mapping), e.g. 12 -> 4 gives (2, 5, 8, 11)."""
    if not 1 <= num_student <= num_teacher:
        raise ValueError(f"bad depths student={num_student} teacher={num_teacher}")
    return tuple(
        round((i + 1) * num_teacher / num_student) - 1 for i in range(num_student)
    )


def stacking_layer_map(num_deep: int, num_shallow: int) -> tuple[int, ...]:
    """Shallow layer index feeding each deep layer when GROWING a stack:
    deep layer i copies shallow layer ``floor(i * num_shallow / num_deep)``,
    so each shallow layer expands into a contiguous run and depth order is
    preserved, e.g. 6 -> 12 gives (0,0,1,1,2,2,3,3,4,4,5,5). This is the
    interleaved/adjacent-duplication variant of progressive stacking --
    Gong et al. 2019 ("Efficient Training of BERT by Progressively
    Stacking") instead copy the whole shallow block on top (deep layer i
    <- shallow layer ``i % num_shallow``); adjacent duplication keeps each
    duplicated pair next to the residual stream position it was trained
    at, which is the better init when depths are not exact multiples."""
    if not 1 <= num_shallow <= num_deep:
        raise ValueError(f"bad depths deep={num_deep} shallow={num_shallow}")
    return tuple(i * num_shallow // num_deep for i in range(num_deep))


def init_student_from_teacher(student_params, teacher_params):
    """Copy teacher weights into a student of the same family at any depth.

    The encoders are scan-stacked (every per-layer leaf carries a leading
    [L] axis, ``core.encoder_init``), so depth change is an index-take on
    any leaf pair that agrees on trailing dims: a SHALLOWER student takes
    the evenly-spaced teacher layers (DistilBERT-style compression), a
    DEEPER one duplicates each teacher layer into a contiguous run
    (progressive stacking -- how a from-scratch 12x768 run escapes the
    Post-LN flat basin that direct training sits in). Same-shape leaves
    (embeddings, pooler, heads, LXMERT's per-stack leaves at equal depth)
    copy verbatim. The depth mapping applies ONLY to leaves under an
    encoder subtree (the scan-stacked [L]-leading leaves); any other
    leading-dim mismatch -- e.g. a student with a bigger vocab or
    max_position_embeddings via --student-overrides -- keeps its fresh
    init rather than silently index-mapping teacher rows. Works for all
    families, including LXMERT's three stacks with independent depths.
    """
    from jax.tree_util import DictKey, tree_map_with_path

    def merge(path, s, t):
        if s.shape == t.shape:
            return t
        in_encoder = any(
            isinstance(k, DictKey) and "encoder" in str(k.key) for k in path
        )
        if (
            in_encoder
            and s.ndim == t.ndim
            and s.ndim >= 1
            and s.shape[1:] == t.shape[1:]
        ):
            if s.shape[0] < t.shape[0]:
                idx = np.asarray(evenly_spaced_layers(s.shape[0], t.shape[0]))
            else:
                idx = np.asarray(stacking_layer_map(s.shape[0], t.shape[0]))
            return jnp.asarray(t)[idx]
        return s

    return tree_map_with_path(merge, student_params, teacher_params)


# ---------------------------------------------------------------------------
# teacher sources
# ---------------------------------------------------------------------------


@dataclass
class TeacherScores:
    """Offline soft targets from reference-format score files, keyed by
    (query_id, product_id). Several files fuse into one weighted-average
    teacher -- pass the ensemble weights (0.2/0.2/0.3/0.3, ``main.py:59``)
    to distil the full ensemble."""

    probs: dict[tuple[str, str], float]

    @classmethod
    def from_ensemble_files(
        cls,
        scores_b,
        scores_c,
        scores_a,
        scores_lxmert,
        weights: tuple[float, float, float, float] | None = None,
    ) -> "TeacherScores":
        """The full reference ensemble as the teacher: the four score files
        fused with ``code/main.py:49-59`` semantics -- pair universe from
        the LXMERT table, missing B/C/A pairs backfilled with the LXMERT
        score, weights 0.2/0.2/0.3/0.3 by default."""
        from ..ensemble.fusion import DEFAULT_WEIGHTS, fuse

        def load(p):
            return (
                load_csv_scores(p) if str(p).endswith(".csv") else load_tsv_scores(p)
            )

        fusion = fuse(
            load(scores_b),
            load(scores_c),
            load(scores_a),
            load(scores_lxmert),
            weights=weights or DEFAULT_WEIGHTS,
        )
        return cls(
            {
                (qid, pid): s
                for qid, row in fusion.merge.items()
                for pid, s in row.items()
            }
        )

    @classmethod
    def from_files(
        cls, paths: list[str], weights: list[float] | None = None
    ) -> "TeacherScores":
        if weights is None:
            weights = [1.0 / len(paths)] * len(paths)
        if len(weights) != len(paths):
            raise ValueError("one weight per score file required")
        tables: list[ScoreTable] = [
            (load_csv_scores(p) if str(p).endswith(".csv") else load_tsv_scores(p))
            for p in paths
        ]
        probs: dict[tuple[str, str], float] = {}
        base = tables[0]
        for qid, row in base.items():
            for pid in row:
                s = 0.0
                for tab, w in zip(tables, weights):
                    try:
                        s += w * tab[qid][pid]
                    except KeyError:
                        raise KeyError(
                            f"pair ({qid}, {pid}) missing from one of the "
                            f"teacher score files; all files must cover the "
                            f"same pairs (fuse/backfill upstream if not)"
                        ) from None
                probs[(qid, pid)] = s
        return cls(probs)

    def __len__(self) -> int:
        return len(self.probs)

    def attach(self, batch: dict) -> dict:
        """Add ``teacher_prob``/``teacher_weight`` arrays to a stacked batch
        (weight 0 for padded tail rows; an unscored valid pair is an error
        -- offline distillation requires the score files to cover the
        training TSV)."""
        qids = batch["query_id"]
        pids = batch["product_id"]
        valid = batch.get("valid", np.ones(len(qids), dtype=bool))
        probs = np.zeros(len(qids), dtype=np.float32)
        weight = np.zeros(len(qids), dtype=np.float32)
        missing = []
        for i, (q, p, v) in enumerate(zip(qids, pids, valid)):
            if not v:
                continue
            key = (str(int(q)), str(int(p)))
            got = self.probs.get(key)
            if got is None:
                missing.append(key)
                continue
            probs[i] = got
            weight[i] = 1.0
        if missing:
            raise KeyError(
                f"{len(missing)} pairs in the batch have no teacher score, "
                f"first: {missing[0]} -- score the distillation TSV with the "
                f"teacher(s) first"
            )
        out = dict(batch)
        out["teacher_prob"] = probs
        out["teacher_weight"] = weight
        return out


class LiveTeacher:
    """A full-depth teacher checkpoint scoring every batch in serving mode
    (fed label = 1). One jitted program, reused across batches."""

    def __init__(self, spec, params, precision=None):
        from ..models import Precision

        precision = precision if precision is not None else Precision.bf16()
        self.spec = spec
        self.params = jax.device_put(params)

        def _score(p, model_batch):
            return spec.apply(p, model_batch, spec.config, precision)["score"]

        self._score = jax.jit(_score)

    def attach(self, batch: dict) -> dict:
        model_batch = model_batch_of(batch)
        if "labels" in model_batch:
            # serving-mode fed label (testB feeds 1: evaluate_normal.py:240)
            model_batch["labels"] = np.ones_like(batch["labels"])
        probs = np.asarray(jax.device_get(self._score(self.params, model_batch)))
        valid = batch.get("valid", np.ones(probs.shape[0], dtype=bool))
        out = dict(batch)
        out["teacher_prob"] = probs.astype(np.float32)
        out["teacher_weight"] = np.asarray(valid, np.float32)
        return out
