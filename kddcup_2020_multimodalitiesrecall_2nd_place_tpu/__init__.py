"""TPU-native rebuild of the KDD Cup 2020 "Multimodalities Recall" 2nd-place stack.

A brand-new JAX/XLA/Pallas framework with the same capabilities as the
reference repo ``zuokai/KDDCUP_2020_MultimodalitiesRecall_2nd_Place``
(three TF1 ImageBERT variants + a PyTorch LXMERT, ensembled into a
query -> top-5 product submission). The four reference model stacks are
re-designed as four configurations of one cross-modal transformer family,
scored by a single pjit engine over a device mesh.

Layout
------
- ``tokenization``  BERT WordPiece tokenizer (pure Python, vocab 21128).
- ``data``          TSV pair parsing, base64 RoI feature decode, fixed-shape
                    batching for the three input layouts, async host loader.
- ``models``        functional JAX model family (ImageBERT-A/B/C, LXMERT)
                    plus slow numpy "spec" oracles used as golden tests.
- ``ops``           Pallas TPU kernels + jnp reference implementations.
- ``parallel``      mesh construction, shardings, the pjit scoring engine.
- ``train``         optimizers, losses (NSP/AM-softmax/MS/MLM), EMA, trainer.
- ``checkpoint``    orbax save/restore + TF1/PyTorch name-schema importers.
- ``ensemble``      score fusion + product-dedup rerank -> submission.csv.
- ``eval``          nDCG@5.

Reference citations in docstrings use ``path:line`` relative to the
reference repo root.
"""

__version__ = "0.1.0"

from pathlib import Path

PACKAGE_ROOT = Path(__file__).resolve().parent
REPO_ROOT = PACKAGE_ROOT.parent
ASSETS_DIR = REPO_ROOT / "assets"
VOCAB_PATH = ASSETS_DIR / "user_data" / "vocab.txt"
BERT_CONFIG_PATH = ASSETS_DIR / "user_data" / "bert_config.json"
VALID_ANSWER_PATH = ASSETS_DIR / "valid_answer.json"
