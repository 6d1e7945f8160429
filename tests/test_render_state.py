"""Progressive accumulation driver: EMA-mean equivalence, camera-move
reset, done latch, and checkpoint/resume roundtrip (SURVEY.md §5.4)."""

import os

import numpy as np

import halogen_tpu as ht
from halogen_tpu.scene import cornell

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
ST = ht.RenderSettings(width=16, height=16, samples_per_pixel=2,
                       max_bounces=2, ray_chunk_size=256,
                       max_accumulated_frames=4, unlimited_sampling=False)


def test_done_latch_stops_accumulation():
    scene = cornell.cornell_box().build()
    r = ht.Renderer(scene, CAM, ST)
    for _ in range(10):
        r.step()
    assert r.done
    assert int(r.state.frame_count) == ST.max_accumulated_frames + 1
    img_before = r.image.copy()
    r.step()  # no-op once done (HalogenRenderPass.cs:307)
    np.testing.assert_array_equal(r.image, img_before)


def test_camera_move_resets():
    scene = cornell.cornell_box().build()
    r = ht.Renderer(scene, CAM, ST)
    r.step()
    r.step()
    assert int(r.state.frame_count) == 3
    moved = ht.make_camera(position=(0.1, 0, 3.2), target=(0, 0, 0),
                           fov_deg=40)
    r.set_camera(moved)
    assert int(r.state.frame_count) == 1  # cleared (HalogenRenderPass.cs:279)
    r.set_camera(moved)  # same camera: no reset
    r.step()
    assert int(r.state.frame_count) == 2


def test_checkpoint_roundtrip(tmp_path):
    scene = cornell.cornell_box().build()
    r = ht.Renderer(scene, CAM, ST)
    r.step()
    r.step()
    path = os.path.join(tmp_path, "ckpt.npz")
    r.save_checkpoint(path)

    r2 = ht.Renderer(scene, CAM, ST)
    r2.load_checkpoint(path)
    assert int(r2.state.frame_count) == int(r.state.frame_count)
    np.testing.assert_array_equal(r2.image, r.image)
    # resuming continues the same deterministic stream
    r.step()
    r2.step()
    np.testing.assert_array_equal(r2.image, r.image)


def test_unlimited_sampling_never_done():
    scene = cornell.cornell_box().build()
    r = ht.Renderer(scene, CAM, ST.replace(unlimited_sampling=True))
    for _ in range(ST.max_accumulated_frames + 2):
        r.step()
    assert not r.done


def test_accumulate_off_pins_sample_stream():
    """accumulate=False pins the sample index to 1 — static noise across
    frames (the reference's Accumulate toggle, HalogenRenderPass.cs:378)."""
    scene = cornell.cornell_box().build()
    st = ST.replace(accumulate=False)
    r = ht.Renderer(scene, CAM, st)
    a = r.step()
    b = r.step()
    np.testing.assert_array_equal(a, b)
    assert int(r.state.frame_count) == 1
