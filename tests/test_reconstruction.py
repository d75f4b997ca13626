"""The batched Gaussian-reconstruction kernel is validated against a naive
per-sample numpy oracle implementing the documented semantics with real
python loops, np.arange and np.interp (i.e. the reference's computational
shape, independently coded)."""

import numpy as np
import pytest

from ae_waveforms_tpu.traditional.reconstruction import (
    reconstruct_gaussian,
    reconstruct_gaussian_batch,
)


def oracle_gaussian_line(x1, y1, x2, y2, s):
    a = max(y1, y2)
    mu = x2 if y2 > y1 else x1
    t = np.arange(int(x1), int(x2))
    g = a * np.exp(-((t - mu) ** 2) / (2 * s**2))
    if y2 > y1:
        return (g - g[0]) * (y2 - y1) / (g[-1] - g[0]) + y1
    return (g - g[-1]) * (y1 - y2) / (g[0] - g[-1]) + y2


def oracle_reconstruct(x, y, x_t, baseline, sigma_map):
    xs = np.concatenate([[x_t[0]], x, [x_t[-1]]])
    ys = np.concatenate([[baseline], y, [baseline]])
    nan_mask = np.isnan(xs) | np.isnan(ys)
    xc = xs[~nan_mask]
    yc = ys[~nan_mask]
    order = np.argsort(xc, kind="stable")
    xc, yc = xc[order], yc[order]
    step = x_t[1] - x_t[0]
    # skip-first duplicate nudging, repeated until unique
    while True:
        changed = False
        seen = set()
        for i in range(len(xc)):
            if xc[i] in seen:
                xc[i] += step
                changed = True
            else:
                seen.add(xc[i])
        if not changed:
            break

    out = []
    i_nan = 0
    for i in range(len(xc) - 1):
        x1, x2, y1, y2 = xc[i], xc[i + 1], yc[i], yc[i + 1]
        sigma = abs(x2 - x1) / sigma_map[i_nan]
        while nan_mask[i_nan + 1]:
            sigma = abs(x2 - x1) / 1
            i_nan += 1
        if (x2 - x1 > 1) and (x2 > x_t[0]) and (x1 < x_t[-1]):
            out.extend(oracle_gaussian_line(x1, y1, x2, y2, sigma))
        i_nan += 1
    return np.interp(x_t, np.linspace(x_t[0], x_t[-1], len(out)), np.asarray(out))


def _sample_fiducials(rng, with_nans=0):
    """Plausible fiducial layout (ms relative to R): P on/peak/off, Q, R on,
    R, R off, S, T on/peak/off."""
    base_x = np.array([-180.0, -160.0, -140.0, -35.0, -20.0, 0.0, 25.0, 40.0, 120.0, 180.0, 240.0])
    x = base_x + rng.uniform(-6, 6, size=11)
    x[5] = 0.0
    y = np.array([-0.9, -0.75, -0.9, -1.1, -1.0, -1e-10, -1.05, -1.2, -0.8, -0.6, -0.85])
    y = y + rng.uniform(-0.05, 0.05, size=11)
    y[5] = -1e-10
    if with_nans:
        drop = rng.choice([0, 1, 2, 3, 4, 6, 7, 8, 9, 10], size=with_nans, replace=False)
        x[drop] = np.nan
    return x, y


X_TIME = np.linspace(-106, 213, 320) / 500 * 1000  # ms, step 2


@pytest.mark.parametrize("with_nans", [0, 1, 3])
def test_kernel_matches_oracle(with_nans):
    rng = np.random.default_rng(42 + with_nans)
    sigma_map = np.array([1, 2, 2, 3, 2, 3, 3, 2, 3, 2, 2, 1], float)
    for trial in range(8):
        x, y = _sample_fiducials(rng, with_nans)
        baseline = float(np.nanmean(y[[1, 2, 8, 10]]))
        ref = oracle_reconstruct(x.copy(), y, X_TIME, baseline, sigma_map)
        got = np.asarray(reconstruct_gaussian(x, y, X_TIME, baseline, sigma_map))
        np.testing.assert_allclose(got, ref, atol=5e-5)


def test_batch_matches_loop():
    rng = np.random.default_rng(7)
    sigma_map = np.array([1, 1, 1, 2, 2, 3, 3, 3, 4, 2, 2, 1], float)
    xs, ys, bs = [], [], []
    for _ in range(12):
        x, y = _sample_fiducials(rng, rng.integers(0, 3))
        xs.append(x)
        ys.append(y)
        bs.append(float(np.nanmean(y[[1, 2, 8, 10]])))
    xs, ys, bs = np.array(xs), np.array(ys), np.array(bs)
    batch = np.asarray(reconstruct_gaussian_batch(xs, ys, X_TIME.astype(np.float32), bs, sigma_map))
    for i in range(12):
        one = np.asarray(reconstruct_gaussian(xs[i], ys[i], X_TIME, bs[i], sigma_map))
        np.testing.assert_allclose(batch[i], one, atol=1e-5)


def test_duplicate_nudging():
    rng = np.random.default_rng(3)
    x, y = _sample_fiducials(rng)
    x[4] = x[3]  # exact duplicate
    sigma_map = np.ones(12)
    baseline = -0.8
    ref = oracle_reconstruct(x.copy(), y, X_TIME, baseline, sigma_map)
    got = np.asarray(reconstruct_gaussian(x, y, X_TIME, baseline, sigma_map))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_gp_minimize_runs_and_improves():
    """From-scratch GP/EI optimiser over the sigma lattice."""
    from ae_waveforms_tpu.traditional.sigma_search import (
        SIGMA_MAP_X0,
        gp_minimize,
        make_objective,
        prepare_reconstruction_inputs,
        sweep_search,
    )

    rng = np.random.default_rng(0)
    feats = np.full((6, 35), np.nan)
    # synthesize plausible feature rows through the reconstruction inputs:
    # build from the fiducial sampler instead
    xs, ys, bs = [], [], []
    for _ in range(6):
        x, y = _sample_fiducials(rng)
        xs.append(x)
        ys.append(y)
        bs.append(float(np.nanmean(y[[1, 2, 8, 10]])))
    xs, ys, bs = np.array(xs), np.array(ys), np.array(bs)

    # target beats: reconstructions with a known sigma map + noise
    target_map = np.array([1, 2, 2, 3, 2, 3, 3, 2, 3, 2, 2, 1], float)
    from ae_waveforms_tpu.traditional.reconstruction import reconstruct_gaussian_batch

    beats = np.asarray(
        reconstruct_gaussian_batch(
            xs.astype(np.float32), ys.astype(np.float32), X_TIME.astype(np.float32),
            bs.astype(np.float32), target_map.astype(np.float32),
        )
    )
    objective = _objective = None
    from ae_waveforms_tpu.traditional.sigma_search import make_objective as mo

    objective = mo(xs, ys, bs, X_TIME, beats)

    res = gp_minimize(objective, n_calls=40, seed=42, x0=SIGMA_MAP_X0, n_initial=12, batch_per_iter=8)
    assert len(res.x) == 12 and all(1 <= v <= 5 for v in res.x)
    assert res.fun <= float(objective(np.asarray(SIGMA_MAP_X0)[None])[0]) + 1e-12

    best_map, best = sweep_search(objective, n_candidates=128, seed=0, x0=SIGMA_MAP_X0)
    assert best <= res.fun + 1e-6 or best < 1e-4  # the sweep should do at least as well


def test_spline_alternatives():
    from ae_waveforms_tpu.traditional.reconstruction import (
        reconstruct_akima,
        reconstruct_akima_pchip_mean,
        reconstruct_pchip,
    )

    rng = np.random.default_rng(1)
    x, y = _sample_fiducials(rng, with_nans=1)
    baseline = float(np.nanmean(y[[1, 2, 8, 10]]))
    ak = reconstruct_akima(x, y, X_TIME, baseline)
    pc = reconstruct_pchip(x, y, X_TIME, baseline)
    assert ak.shape == pc.shape == X_TIME.shape
    # interpolants pass through the anchors (sample an interior fiducial)
    xi = x[~np.isnan(x)]
    yi = y[~np.isnan(x)]
    k = np.argmin(np.abs(X_TIME - xi[3]))
    assert abs(pc[k] - yi[3]) < 0.2  # pchip is shape-preserving near anchors
    mean = reconstruct_akima_pchip_mean(ak, pc)
    np.testing.assert_allclose(mean, (ak + pc) / 2)
