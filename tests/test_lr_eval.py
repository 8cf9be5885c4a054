"""lr_eval research extra: AP matches sklearn exactly; trained probe beats
zero-shot on planted data."""
import numpy as np

from seesaw_tpu.research.lr_eval import (
    average_precision_score,
    eval_scorers,
    get_metrics,
)


def test_ap_matches_sklearn():
    import sklearn.metrics as sk

    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(5, 200))
        ys = rng.integers(0, 2, size=n).astype(bool)
        if not ys.any():
            ys[0] = True
        scores = rng.normal(size=n)
        if trial % 3 == 0:  # exercise tied scores
            scores = np.round(scores, 1)
        assert np.isclose(
            average_precision_score(ys, scores),
            sk.average_precision_score(ys, scores),
        ), trial


def test_frame_pooled_metrics_and_probe():
    rng = np.random.default_rng(1)
    n_frames, tiles, d = 60, 5, 16
    dbidx = np.repeat(np.arange(n_frames), tiles)
    target = rng.normal(size=d); target /= np.linalg.norm(target)
    pos_frames = rng.choice(n_frames, size=20, replace=False)
    ys = np.zeros(n_frames * tiles)
    V = rng.normal(size=(n_frames * tiles, d)) * 0.8
    for f in pos_frames:
        # one matching tile per positive frame
        i = f * tiles + int(rng.integers(tiles))
        V[i] += 2.5 * target
        ys[i] = 1.0
    V /= np.linalg.norm(V, axis=1, keepdims=True)

    noisy_q = target + 0.8 * rng.normal(size=d)
    df = eval_scorers(V.astype(np.float32), ys, dbidx, qvec=noisy_q, seed=0)
    assert set(df.scorer) == {"zero_shot", "logistic"}
    assert set(df.frame_pooling) == {False, True}
    zs = df[(df.scorer == "zero_shot") & (~df.frame_pooling)].ap.iloc[0]
    lr = df[(df.scorer == "logistic") & (~df.frame_pooling)].ap.iloc[0]
    assert lr > zs  # the trained probe denoises the query

    m = get_metrics(dbidx, ys, V @ target, frame_pooling=True)
    assert m["n"] == n_frames and m["npos"] == 20
