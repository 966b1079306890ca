from .ndcg import (
    pair_labels,
    dcg_at_k,
    evaluate_scores,
    evaluate_submission,
    load_answers,
    ndcg_at_k,
)

__all__ = [
    "pair_labels",
    "dcg_at_k",
    "evaluate_scores",
    "evaluate_submission",
    "load_answers",
    "ndcg_at_k",
]
