"""Golden-fixture regression tests (the reference's frozen-JSON pattern,
SURVEY §4: committed outputs act as drift detectors between rounds).

Regenerate tests/golden/kernels_v1.json ONLY on an intentional formula
change, and say so in the commit message.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN = json.loads((Path(__file__).parent / "golden" / "kernels_v1.json").read_text())

SCORES = {
    "q1": [0.95, 0.87, 0.82, 0.76, 0.71, 0.65, 0.58, 0.52, 0.47, 0.41],
    "q2": [3.2, 1.1, 0.9, 0.85, 0.8],
    "q3": [1.0, 1.0, 1.0, 1.0],
}
TEXTS = {"q1": "sample test query", "q2": "alpha beta", "q3": "x"}


@pytest.mark.parametrize("norm,key", [("none", "qpp_raw"), ("minmax", "qpp_minmax")])
def test_qpp_golden(norm, key):
    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp

    got = compute_qpp(SCORES, TEXTS, normalize=norm)
    for qid, expected in GOLDEN[key].items():
        np.testing.assert_allclose(got[qid], expected, rtol=1e-5, atol=1e-6,
                                   err_msg=f"{key}/{qid}")


@pytest.mark.slow
def test_fusion_golden():
    from qpp_fusion_rag_tpu.ops.fusion import fuse

    ids = np.array([[[1, 2, 3], [4, 5, -1]], [[2, 3, 6], [5, 7, -1]]], np.int32)
    sc = np.array([[[0.9, 0.5, 0.1], [1.0, 0.2, -np.inf]],
                   [[0.8, 0.6, 0.3], [0.7, 0.4, -np.inf]]], np.float32)
    w = np.array([[0.9, 0.2], [0.1, 0.8]], np.float32)

    for method, expected in GOLDEN["fusion"].items():
        kw = {}
        if method == "wcombsum":
            fi, fs = fuse(jnp.asarray(ids), jnp.asarray(sc),
                          weights=jnp.asarray(w), method="combsum", k_out=4)
        else:
            fi, fs = fuse(jnp.asarray(ids), jnp.asarray(sc), method=method, k_out=4)
        np.testing.assert_array_equal(np.asarray(fi), expected["ids"], err_msg=method)
        got_scores = np.where(np.isfinite(np.asarray(fs)), np.asarray(fs), -1e30)
        np.testing.assert_allclose(got_scores, expected["scores"],
                                   rtol=1e-5, atol=1e-5, err_msg=method)
