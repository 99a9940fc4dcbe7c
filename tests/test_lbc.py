"""LBC waypoint-model family (carla_project/src parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from cadre_tpu.models.lbc import (
    Converter,
    ImageModel,
    MapModel,
    RawController,
    SEG_COLOR,
    SEG_CONVERTER,
    SegmentationModel,
    spatial_softmax,
    to_heatmap,
)


def test_seg_luts():
    assert SEG_CONVERTER.shape == (16,)
    assert SEG_CONVERTER.max() == 8
    assert SEG_COLOR.shape == (9, 3)


def test_to_heatmap_peak_and_window():
    pts = jnp.asarray([[30.0, 20.0], [0.0, 0.0]])
    hm = to_heatmap(pts, 64, 128, radius=5)
    assert hm.shape == (2, 64, 128)
    assert float(hm[0, 20, 30]) == 1.0       # unit peak at the point
    assert float(hm[0, 20, 36]) == 0.0       # zero outside the window
    assert float(hm[1, 0, 0]) == 1.0         # clamped corner point


def test_spatial_softmax_soft_argmax():
    logit = jnp.full((1, 9, 17, 1), -1e9)
    logit = logit.at[0, 2, 12, 0].set(0.0)   # single hot pixel
    xy = spatial_softmax(logit, temperature=1.0)
    np.testing.assert_allclose(xy[0, 0, 0], -1 + 2 * 12 / 16, atol=1e-3)
    np.testing.assert_allclose(xy[0, 0, 1], -1 + 2 * 2 / 8, atol=1e-3)


def test_converter_round_trip():
    conv = Converter()
    map_pts = jnp.asarray([[128.0, 200.0], [100.0, 180.0]])
    cam = conv.map_to_cam(map_pts)
    back = conv.cam_to_map(cam)
    np.testing.assert_allclose(np.asarray(back), np.asarray(map_pts),
                               atol=1e-3)
    # points ahead of the ego project below the horizon
    assert bool((cam[:, 1] > conv.h / 2).all())


def test_map_and_image_models():
    rng = jax.random.PRNGKey(0)
    topdown = jnp.zeros((2, 64, 64, 10))
    target = jnp.asarray([[32.0, 20.0], [10.0, 50.0]])
    model = MapModel(n_steps=4)
    variables = model.init(rng, topdown, target, with_actions=True)
    pts, actions = model.apply(variables, topdown, target,
                               with_actions=True)
    assert pts.shape == (2, 4, 2)
    assert float(jnp.abs(pts).max()) <= 1.0
    assert actions.shape == (2, 2)

    img = jnp.zeros((2, 72, 128, 3))
    target_cam = jnp.asarray([[64.0, 40.0], [20.0, 60.0]])
    imodel = ImageModel(n_steps=4)
    ivars = imodel.init(rng, img, target_cam)
    ipts = imodel.apply(ivars, img, target_cam)
    assert ipts.shape == (2, 4, 2)


def test_raw_controller_shapes():
    model = RawController()
    pts = jnp.zeros((3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (3, 2)
