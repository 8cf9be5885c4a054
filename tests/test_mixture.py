"""GMM research extra: EM recovers planted clusters; labels seed center 0."""
import numpy as np

from seesaw_tpu.research.mixture import MixtureModel, gen_data, kmeans_plusplus


def test_em_recovers_clusters():
    X, cats, probs, mus, _ = gen_data(n_classes=3, n_dim=4, n_samples=1500, seed=3)
    mm = MixtureModel(n_components=3, seed=0)
    ll_final = mm.fit(X, max_iters=60)
    assert np.isfinite(ll_final)

    # each true center should be close to some fitted center
    for mu in mus:
        d = np.linalg.norm(mm.mus - mu, axis=1).min()
        assert d < 0.5, f"center {mu} unmatched (min dist {d})"

    # mixture weights approximate the class priors
    fitted = np.sort(np.exp(mm.log_pz))
    assert np.abs(np.sort(probs) - fitted).max() < 0.1


def test_label_seeded_init_and_ll_improves():
    X, cats, _, mus, _ = gen_data(n_classes=3, n_dim=4, n_samples=800, seed=5)
    pos_mask = cats == 0  # least popular class = the search target
    Xys = (X[pos_mask][:20], np.ones(min(20, pos_mask.sum())))

    mm0 = MixtureModel(n_components=3, seed=0)
    ll0 = mm0.fit(X, Xys=Xys, max_iters=1)
    mm = MixtureModel(n_components=3, seed=0)
    ll = mm.fit(X, Xys=Xys, max_iters=50)
    assert ll >= ll0  # EM is monotone in likelihood

    # responsibilities are a proper distribution and separate the data
    p = mm.predict_proba(X[:50])
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-5)


def test_kmeanspp_fixed_first_center():
    X = np.random.default_rng(0).normal(size=(200, 3)).astype(np.float32)
    c0 = np.array([5.0, 5.0, 5.0], np.float32)
    centers = kmeans_plusplus(X, c0, n_clusters=4, seed=1)
    np.testing.assert_array_equal(centers[0], c0)
    assert centers.shape == (4, 3)
