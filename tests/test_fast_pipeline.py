"""Native fast pipeline must produce byte-identical batches to Featurizer."""

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import Featurizer, iter_batches
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.fast_pipeline import (
    native_batches_from_files,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import FullTokenizer

try:
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.native import get_lib

    get_lib()
    NATIVE = True
except Exception:
    NATIVE = False

pytestmark = pytest.mark.skipif(not NATIVE, reason="native lib unavailable")


@pytest.fixture(scope="module", params=["imagebert_a", "imagebert_b", "imagebert_c", "lxmert"])
def model_name(request):
    return request.param


def test_native_batches_match_featurizer(model_name, tmp_path):
    tok = FullTokenizer.google_style(VOCAB_PATH)
    fz = Featurizer(tok, SYNTHETIC_LABELS, sen2forest=(model_name == "imagebert_c"))
    lines = make_tsv(23, seed=11)
    p = tmp_path / "t.tsv"
    p.write_text("\n".join(lines) + "\n")

    slow = list(iter_batches(lines, fz.for_model(model_name), 8))
    fast = list(native_batches_from_files([p], fz, model_name, 8))
    assert len(slow) == len(fast)
    for bs, bf in zip(slow, fast):
        assert set(bs) == set(bf), set(bs) ^ set(bf)
        for k in bs:
            if bs[k].dtype.kind == "f":
                np.testing.assert_allclose(
                    bf[k].astype(np.float64), bs[k].astype(np.float64),
                    rtol=2e-6, atol=1e-7, err_msg=f"{model_name}/{k}",
                )
            else:
                np.testing.assert_array_equal(bf[k], bs[k], err_msg=f"{model_name}/{k}")
