"""Interactive-viewer event loop exercised headlessly over HTTP.

Covers the runtime behavior the reference implements in
``window.rs:145-385`` + ``controllers/virtual_camera_controller.rs:56-98``
+ ``geoviewer.rs:50-67``: WASD camera flight, drag orbit, number-key
visibility toggles, and quit."""

import json
import urllib.request

import numpy as np
import pytest

from align3d_tpu.viz.interactive import InteractiveViewer, WASDCameraController
from align3d_tpu.viz.viewers import GeoViewer


def _make_viewer():
    rng = np.random.default_rng(0)
    gv = GeoViewer(width=160, height=120)
    gv.add(rng.normal(0.0, 0.3, (500, 3)).astype(np.float32))
    gv.add(rng.normal(1.5, 0.3, (500, 3)).astype(np.float32))
    return InteractiveViewer(gv.scene, 160, 120)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.read()


def _post(port, event):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/event",
        data=json.dumps(event).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.read()


@pytest.fixture()
def served():
    viewer = _make_viewer()
    port = viewer.start(port=0)
    yield viewer, port
    viewer.stop()


def test_page_and_frame(served):
    viewer, port = served
    page = _get(port, "/")
    assert b"WASD" in page
    frame = _get(port, "/frame.png")
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"


def test_wasd_moves_camera(served):
    viewer, port = served
    s0 = json.loads(_get(port, "/state"))
    _post(port, {"type": "key", "key": "w"})
    s1 = json.loads(_get(port, "/state"))
    # W flies along the view ray by velocity * radius * 2
    # (virtual_camera_controller.rs:58-63).
    eye0, eye1 = np.asarray(s0["eye"]), np.asarray(s1["eye"])
    step = np.linalg.norm(eye1 - eye0)
    expected = viewer.controller.velocity * viewer.controller.world_radius * 2
    assert step == pytest.approx(expected, rel=1e-5)
    assert np.allclose(s0["view"], s1["view"])  # W translates, no rotation
    _post(port, {"type": "key", "key": "s"})
    s2 = json.loads(_get(port, "/state"))
    assert np.allclose(s2["eye"], s0["eye"], atol=1e-5)  # S undoes W
    _post(port, {"type": "key", "key": "d"})
    s3 = json.loads(_get(port, "/state"))
    assert not np.allclose(s3["eye"], s2["eye"])  # D strafes right


def test_drag_orbits(served):
    viewer, port = served
    s0 = json.loads(_get(port, "/state"))
    _post(port, {"type": "drag", "dx": 40, "dy": 0})
    s1 = json.loads(_get(port, "/state"))
    v0, v1 = np.asarray(s0["view"]), np.asarray(s1["view"])
    assert not np.allclose(v0, v1)  # horizontal drag rotates about up
    assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-5)
    assert np.allclose(s0["eye"], s1["eye"])  # orbit rotates view, not eye


def test_number_keys_toggle_visibility_and_change_frame(served):
    viewer, port = served
    f0 = _get(port, "/frame.png")
    _post(port, {"type": "key", "key": "2"})
    s = json.loads(_get(port, "/state"))
    assert s["visible"] == [True, False]
    f1 = _get(port, "/frame.png")
    assert f0 != f1  # hiding a geometry changes the rendered frame
    _post(port, {"type": "key", "key": "2"})
    s = json.loads(_get(port, "/state"))
    assert s["visible"] == [True, True]


def test_quit_event(served):
    viewer, port = served
    assert not viewer.quit_requested.is_set()
    _post(port, {"type": "quit"})
    assert viewer.quit_requested.wait(timeout=5)


def test_controller_matches_reference_step_math():
    """Pure controller math vs virtual_camera_controller.rs semantics."""
    from align3d_tpu.viz.virtual_camera import VirtualCamera

    cam = VirtualCamera(
        eye=np.array([0.0, 0.0, 5.0], np.float32),
        view=np.array([0.0, 0.0, -1.0], np.float32),
        up=np.array([0.0, 1.0, 0.0], np.float32),
    )
    ctl = WASDCameraController(cam, world_radius=2.0, viewport_width=640)
    ctl.key("w")
    np.testing.assert_allclose(cam.eye, [0, 0, 5 - 0.25 * 2 * 2], atol=1e-6)
    ctl.key("a")
    # right = view x up = (-1,0,0)... view=(0,0,-1), up=(0,1,0) -> right=(1,0,0)
    np.testing.assert_allclose(cam.eye, [-1.0, 0, 4.0], atol=1e-6)
    # Drag right by sensitivity*width pixels rotates about up by 1 rad.
    ctl.drag(-64.0, 0.0)
    assert cam.view[0] != 0.0
    np.testing.assert_allclose(np.linalg.norm(cam.view), 1.0, atol=1e-6)
