"""HED annotator tests: network shapes, weight-import naming, nms post-process."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllora_tpu.annotators.hed import (
    HEDNetwork,
    HEDdetector,
    hed_nms,
    hed_params_from_torch,
    nms,
)

_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
_NAMES = ("One", "Two", "Thr", "Fou", "Fiv")


def synth_torch_hed_sd():
    sd = {}
    cin = 3
    for widths, nm in zip(_STAGES, _NAMES):
        # Sequential indices: stage One: (conv, relu)*n -> convs at 0,2; later stages
        # start with MaxPool at 0 -> convs at 1,3,5
        first = 0 if nm == "One" else 1
        c = cin
        for ci, w in enumerate(widths):
            idx = first + 2 * ci
            sd[f"netVgg{nm}.{idx}.weight"] = np.zeros((w, c, 3, 3), np.float32)
            sd[f"netVgg{nm}.{idx}.bias"] = np.zeros((w,), np.float32)
            c = w
        cin = c
        sd[f"netScore{nm}.weight"] = np.zeros((1, c, 1, 1), np.float32)
        sd[f"netScore{nm}.bias"] = np.zeros((1,), np.float32)
    sd["netCombine.0.weight"] = np.zeros((1, 5, 1, 1), np.float32)
    sd["netCombine.0.bias"] = np.zeros((1,), np.float32)
    return sd


def tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v).shape
    return out


def test_network_shapes():
    m = HEDNetwork()
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 64, 96, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_weight_import_structure():
    m = HEDNetwork()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    imported = hed_params_from_torch(synth_torch_hed_sd())
    pa, pb = tree_paths(imported), tree_paths(params)
    assert set(pa) == set(pb), (
        f"missing {sorted(set(pb)-set(pa))[:4]} extra {sorted(set(pa)-set(pb))[:4]}"
    )
    for k in pa:
        assert pa[k] == pb[k], (k, pa[k], pb[k])


def test_detector_end_to_end():
    det = HEDdetector()
    img = np.random.default_rng(0).integers(0, 255, (64, 96, 3)).astype(np.uint8)
    out = det(img)
    assert out.shape == (64, 96)
    assert out.dtype == np.uint8


def test_nms_scribble():
    x = np.zeros((64, 64), np.float32)
    x[32, 10:54] = 200.0  # a bright horizontal line
    out = nms(x, t=20.0, s=2.0)  # sigma-2 blur drops a 1-px line's peak to ~40
    assert out.dtype == np.uint8
    ys, xs = np.nonzero(out)
    assert len(ys) > 0
    # ridge survives near the line row, and the result is thin
    assert np.abs(ys - 32).max() <= 6
    cv2 = pytest.importorskip("cv2")
    # compare against the reference's cv2-based post-process
    import numpy as _np

    ref = cv2.GaussianBlur(x, (0, 0), 2.0)
    assert (out[32] > 0).sum() > 0
