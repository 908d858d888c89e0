"""SURF matching kernels vs a literal scalar transcription of the
reference algorithm (gdal/alg/gdal_octave.cpp, gdal_simplesurf.cpp),
plus translation-equivariance and the Spark pair operator."""

import numpy as np


from gdal_spark.raster import matching as M


# --- scalar reference transcriptions (test oracle only — O(n^2) loops) ---

def _rect_scalar(I, row, col, w, h):
    H, W = I.shape

    def val(r, c):
        return I[r, c] if (0 <= r < H and 0 <= c < W) else 0.0

    lt_r = (row - 1) if row <= H else -1
    lt_c = (col - 1) if col <= W else -1
    rb_r = min(row + h - 1, H - 1)
    rb_c = min(col + w - 1, W - 1)
    res = val(lt_r, lt_c) + val(rb_r, rb_c) - val(lt_r, rb_c) - val(rb_r, lt_c)
    return max(res, 0.0)


def _layer_scalar(I, octave, interval):
    H, W = I.shape
    fs = 3 * ((2 ** octave) * interval + 1)
    radius = (fs - 1) // 2
    lobe = fs // 3
    lp = 2 * lobe - 1
    norm = fs * fs
    det = np.zeros((H, W))
    signs = np.zeros((H, W))
    for r in range(radius, H - radius + 1):
        for c in range(radius, W - radius + 1):
            dxx = (_rect_scalar(I, r - lobe + 1, c - radius, fs, lp)
                   - 3 * _rect_scalar(I, r - lobe + 1, c - (lobe - 1) // 2, lobe, lp))
            dyy = (_rect_scalar(I, r - radius, c - lobe - 1, lp, fs)
                   - 3 * _rect_scalar(I, r - lobe + 1, c - lobe + 1, lp, lobe))
            dxy = (_rect_scalar(I, r - lobe, c - lobe, lobe, lobe)
                   + _rect_scalar(I, r + 1, c + 1, lobe, lobe)
                   - _rect_scalar(I, r - lobe, c + 1, lobe, lobe)
                   - _rect_scalar(I, r + 1, c - lobe, lobe, lobe))
            dxx, dyy, dxy = dxx / norm, dyy / norm, dxy / norm
            det[r, c] = dxx * dyy - 0.9 * 0.9 * dxy * dxy
            signs[r, c] = 1 if dxx + dyy >= 0 else -1
    return det, signs


def _descriptor_scalar(I, x, y, scale):
    haar = 2 * scale
    desc_side = 20 * scale
    quad = desc_side // 4
    sub = quad // 5
    lt_r = y - desc_side // 2
    lt_c = x - desc_side // 2
    out = []
    for r in range(lt_r, lt_r + desc_side, quad):
        for c in range(lt_c, lt_c + desc_side, quad):
            dx = dy = adx = ady = 0.0
            for sr in range(r, r + quad, sub):
                for sc in range(c, c + quad, sub):
                    cr = sr + sub // 2 - haar // 2
                    cc = sc + sub // 2 - haar // 2
                    cdx = (_rect_scalar(I, cr, cc + haar // 2, haar // 2, haar)
                           - _rect_scalar(I, cr, cc, haar // 2, haar))
                    cdy = (_rect_scalar(I, cr + haar // 2, cc, haar, haar // 2)
                           - _rect_scalar(I, cr, cc, haar, haar // 2))
                    dx += cdx
                    dy += cdy
                    adx += abs(cdx)
                    ady += abs(cdy)
            out += [dx, dy, adx, ady]
    return np.array(out)


def _blob_image(size=256, seed=7, n=24, shift=(0, 0)):
    """Deterministic distinctive blobs (varying size/intensity) on a flat
    background; shift moves every blob by (dx, dy)."""
    rng = np.random.RandomState(seed)
    img = np.zeros((size, size))
    dx, dy = shift
    for i in range(n):
        x = int(rng.randint(56, size - 56)) + dx
        y = int(rng.randint(56, size - 56)) + dy
        side = 5 + (i % 7)
        val = 0.35 + 0.6 * ((i * 37 % 19) / 19.0)
        img[y:y + side, x:x + side] = val
    return img


def test_integral_and_rect_sum_match_scalar():
    rng = np.random.RandomState(3)
    img = rng.rand(17, 23)
    I = M.integral_image(img)
    assert abs(I[-1, -1] - img.sum()) < 1e-9
    rows, cols = np.array([0, 5, 16, 3, -2, 18]), np.array([0, 7, 22, 1, 4, 25])
    for w, h in [(1, 1), (3, 5), (9, 2), (30, 30)]:
        vec = M.rect_sum(I, rows, cols, w, h)
        for i, (r, c) in enumerate(zip(rows, cols)):
            assert abs(vec[i] - _rect_scalar(I, int(r), int(c), w, h)) < 1e-9


def test_octave_layer_matches_scalar():
    rng = np.random.RandomState(11)
    img = rng.rand(40, 44)
    I = M.integral_image(img)
    layer = M.OctaveLayer(1, 1).compute(I)
    det, signs = _layer_scalar(I, 1, 1)
    np.testing.assert_allclose(layer.det, det, atol=1e-12)
    inner = layer.det != 0
    np.testing.assert_array_equal(layer.signs[inner], signs[inner])


def test_descriptor_matches_scalar():
    img = _blob_image(160, seed=5, n=10)
    I = M.integral_image(img)
    xs = np.array([60, 80, 100])
    ys = np.array([70, 90, 62])
    vec = M.compute_descriptors(I, xs, ys, 4)
    for i in range(3):
        ref = _descriptor_scalar(I, int(xs[i]), int(ys[i]), 4)
        np.testing.assert_allclose(vec[i], ref, atol=1e-9)


def test_translation_equivariance_gcps():
    dx, dy = 9, 6
    img1 = _blob_image(shift=(0, 0))
    img2 = _blob_image(shift=(dx, dy))
    gcps = M.match_images(img1, img2)
    assert len(gcps) >= 5
    # every surviving GCP maps (pixel, line) -> (pixel+dx, line+dy)
    np.testing.assert_allclose(gcps[:, 2] - gcps[:, 0], dx)
    np.testing.assert_allclose(gcps[:, 3] - gcps[:, 1], dy)


def test_identity_match_positions():
    img = _blob_image(seed=13)
    gcps = M.match_images(img, img.copy())
    assert len(gcps) >= 5
    np.testing.assert_allclose(gcps[:, 0], gcps[:, 2])
    np.testing.assert_allclose(gcps[:, 1], gcps[:, 3])


def test_ratio_prune_rejects_ambiguous():
    # two identical strong candidates in fp2 -> best/best2 ratio ~1 -> no match
    desc_a = np.zeros(64)
    desc_a[0] = 1.0
    fp1 = {"x": np.array([10]), "y": np.array([10]),
           "sign": np.array([1]), "desc": desc_a[None, :],
           "scale": np.array([4]), "radius": np.array([13])}
    fp2 = {"x": np.array([20, 30]), "y": np.array([20, 30]),
           "sign": np.array([1, 1]), "desc": np.vstack([desc_a, desc_a]),
           "scale": np.array([4, 4]), "radius": np.array([13, 13])}
    assert M.match_feature_points(fp1, fp2) == []


def test_sign_gating_blocks_cross_sign():
    desc = np.zeros((1, 64))
    fp1 = {"x": np.array([1]), "y": np.array([1]), "sign": np.array([1]),
           "desc": desc}
    fp2 = {"x": np.array([2, 3]), "y": np.array([2, 3]),
           "sign": np.array([-1, -1]), "desc": np.vstack([desc[0], desc[0]])}
    assert M.match_feature_points(fp1, fp2) == []


def test_rgb_luminosity():
    r = np.array([[255.0]])
    g = np.array([[255.0]])
    b = np.array([[255.0]])
    np.testing.assert_allclose(M.rgb_to_luminosity(r, g, b), [[1.0]])


def test_matching_points_operator(spark):
    img1 = _blob_image(shift=(0, 0))
    img2 = _blob_image(shift=(9, 6))
    pairs = spark.createDataFrame(
        [(0, 256, 256, bytearray(img1.tobytes()),
          256, 256, bytearray(img2.tobytes()))],
        "pair_id long, w1 int, h1 int, img1 binary, w2 int, h2 int, img2 binary")
    rows = (M.matching_points(pairs)
            .orderBy("gcp_id").collect())
    ref = M.match_images(img1, img2)
    assert len(rows) == len(ref)
    for r, exp in zip(rows, ref):
        assert (r["pixel"], r["line"], r["x"], r["y"]) == tuple(exp)
