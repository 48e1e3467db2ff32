"""BM25 spec tests (the oracle-parity test covers the full chain)."""

import numpy as np

from robosat_ray.stages.retrieval import BM25_IDF_CAP_MILLI, BM25_QUERY


def test_term_score_saturates_with_tf():
    """BM25's defining property: marginal gain per extra occurrence
    shrinks (k1 saturation), unlike raw tf scoring."""
    a = 1000 * 50  # avgdl 50 tokens
    dl = 50
    idf = 5000

    def term(tf):
        return (44 * idf * tf * a) // (20 * a * tf + 6 * a + 18000 * dl)

    gains = np.diff([term(tf) for tf in range(1, 20)])
    assert (gains >= 0).all()
    assert gains[-1] < gains[0]  # strictly diminishing overall


def test_int64_bounds_are_corpus_and_doc_size_independent():
    """The worst-case numerator uses only capped quantities (idf, tf,
    avgdl), so no corpus size or document length can overflow int64."""
    from robosat_ray.stages.retrieval import BM25_AVGDL_CAP_MILLI, BM25_TF_CAP

    numer = 44 * BM25_IDF_CAP_MILLI * BM25_TF_CAP * BM25_AVGDL_CAP_MILLI
    assert numer < np.iinfo(np.int64).max
    # per-term score itself is tiny (denom >= 20*A*tfc), so the summed
    # score over all query terms is far inside int64
    assert len(BM25_QUERY) * (44 * BM25_IDF_CAP_MILLI) // 20 < 1 << 32
