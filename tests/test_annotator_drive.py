"""Drive `SegmentationAnnotator`'s FULL control flow headless (VERDICT r2
#6): no X server exists in this container, so a stub ``tkinter`` (fake
root/canvas/buttons recording every call) is injected and the annotator is
driven through draw -> undo -> OK -> Retrain (live-preview callback) ->
Generate on a res-32 pipeline. After this, the only untested surface is
tk's own rendering.

Reference behavior being exercised: `seg_annotator.py:245-304` (button
actions), `:104-135` (stroke model + ctrl-z), `:322-337` (save format).
"""

import sys
import types

import numpy as np
import pytest


# --------------------------------------------------------------- tk stub
class FakeEvent:
    def __init__(self, x=0, y=0, num=0, keycode=0):
        self.x, self.y, self.num, self.keycode = x, y, num, keycode


class _Widget:
    def __init__(self, *args, **kw):
        self.kw = dict(kw)
        self.packed = False
        self.bindings = {}

    def pack(self, **kw):
        self.packed = True

    def bind(self, event, handler):
        self.bindings[event] = handler

    def config(self, **kw):
        self.kw.update(kw)

    configure = config


class FakeButton(_Widget):
    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.command = kw.get("command")
        self.text = kw.get("text")

    @property
    def state(self):
        return self.kw.get("state", "normal")

    def invoke(self):
        assert self.state != "disabled", f"{self.text} is disabled"
        return self.command()


class FakeCanvas(_Widget):
    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self._next = 1
        self.alive = set()
        self.calls = []

    def _create(self, kind, *args, **kw):
        cid = self._next
        self._next += 1
        self.alive.add(cid)
        self.calls.append((kind, cid, args, kw))
        return cid

    def create_line(self, *a, **kw):
        return self._create("line", *a, **kw)

    def create_oval(self, *a, **kw):
        return self._create("oval", *a, **kw)

    def create_image(self, *a, **kw):
        return self._create("image", *a, **kw)

    def delete(self, cid):
        self.alive.discard(cid)

    def update(self):
        pass


class FakeRoot(_Widget):
    def title(self, t):
        self._title = t


class FakePhotoImage:
    def __init__(self, image=None):
        self._size = image.size  # PIL Image

    def width(self):
        return self._size[0]

    def height(self):
        return self._size[1]


@pytest.fixture
def stub_tk(monkeypatch):
    tk = types.ModuleType("tkinter")
    tk.Frame = _Widget
    tk.Button = FakeButton
    tk.Canvas = FakeCanvas
    tk.Tk = FakeRoot
    tk.BOTTOM, tk.BOTH, tk.RIGHT, tk.NW = "bottom", "both", "right", "nw"
    monkeypatch.setitem(sys.modules, "tkinter", tk)

    import PIL
    imagetk = types.ModuleType("PIL.ImageTk")
    imagetk.PhotoImage = FakePhotoImage
    monkeypatch.setitem(sys.modules, "PIL.ImageTk", imagetk)
    monkeypatch.setattr(PIL, "ImageTk", imagetk, raising=False)
    return tk


# ----------------------------------------------------------------- drive
@pytest.mark.slow
def test_full_annotator_control_flow(tmp_path, stub_tk, monkeypatch):
    import random
    random.seed(0)

    import gan_segmentation_tpu.apps.annotator as ann
    from gan_segmentation_tpu.core.config import SolverConfig

    # fast solver schedule (the annotator builds its own SegSolver)
    orig_solver = ann.SegSolver

    def fast_solver(max_res_log2, data, ckpt, **kw):
        cfg = SolverConfig(max_res_log2=max_res_log2)
        cfg.train_epochs = 2
        kw.setdefault("cfg", cfg)
        return orig_solver(max_res_log2, data, ckpt, **kw)

    monkeypatch.setattr(ann, "SegSolver", fast_solver)
    monkeypatch.setattr(ann.time, "sleep", lambda s: None)

    root = FakeRoot()
    a = ann.SegmentationAnnotator(
        root, str(tmp_path), gan_dir="/nonexistent", gan="bedrooms",
        n_generate=3, gan_batch_size=2, max_res_log2=5)

    # initial state: untrained solver -> Generate disabled, image shown
    assert a.generate_btn.state == "disabled"
    assert any(c[0] == "image" for c in a.can.calls)
    assert (tmp_path / "data").is_dir() and (tmp_path / "checkpoints").is_dir()

    # --- draw a positive drag (3 points) and a ctrl (negative) drag
    a.on_mouse_down(FakeEvent(4, 4))
    a.on_mouse_move(FakeEvent(10, 10))
    a.on_mouse_move(FakeEvent(16, 16))
    a.on_mouse_up(FakeEvent(16, 16))
    assert len(a.strokes.history) == 3

    a.on_key_down(FakeEvent(keycode=37))        # ctrl down
    assert a.ctrl
    a.on_mouse_down(FakeEvent(24, 6))
    a.on_mouse_up(FakeEvent(24, 6))
    assert a.strokes.history[-1].start_cap[4] == ann.NEGATIVE_COLOR

    # ctrl-z removes only the last drag (the negative dot)
    n_alive = len(a.can.alive)
    a.on_key_down(FakeEvent(keycode=52))        # z while ctrl held
    assert len(a.strokes.history) == 3
    assert len(a.can.alive) < n_alive           # canvas items deleted too
    a.on_key_up(FakeEvent(keycode=37))
    assert not a.ctrl

    # mouse wheel resizes the brush both ways
    w0 = a.width
    a.on_mouse_wheel(FakeEvent(num=4))
    assert a.width > w0
    a.on_mouse_wheel(FakeEvent(num=5))
    assert abs(a.width - w0) < 1e-6

    # --- OK: saves the triple in the reference format, advances the image
    img_id = a.image_id
    a.ok_btn.invoke()
    data = tmp_path / "data"
    assert (data / f"mask_{img_id:06d}.png").exists()
    assert (data / f"img_{img_id:06d}.jpg").exists()
    assert (data / f"vis_img_{img_id:06d}.jpg").exists()
    assert (data / f"feat_{img_id:06d}.pickle").exists()
    assert a.image_id != img_id and not a.strokes.has_changes

    import cv2
    mask = cv2.imread(str(data / f"mask_{img_id:06d}.png"),
                      cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(mask)) <= {0, 128, 255}
    assert (mask == 255).any() and not (mask == 128).any()  # undo held

    # Skip advances without saving
    n_files = len(list(data.iterdir()))
    a.skip_btn.invoke()
    assert len(list(data.iterdir())) == n_files

    # --- Retrain: draw + retrain; epoch-end live preview redraws the canvas
    a.on_mouse_down(FakeEvent(8, 8))
    a.on_mouse_up(FakeEvent(8, 8))
    images_before = sum(c[0] == "image" for c in a.can.calls)
    a.retrain_btn.invoke()
    assert a.solver.is_trained
    # 2 epochs -> >= 2 live-preview set_img calls beyond the pre-train state
    assert sum(c[0] == "image" for c in a.can.calls) >= images_before + 2
    # post-train button states: everything re-enabled incl. Generate
    for b in (a.ok_btn, a.skip_btn, a.retrain_btn, a.generate_btn):
        assert b.state == "normal"

    # --- Generate: emits the synthetic dataset and re-enables the UI
    a.generate_btn.invoke()
    out = tmp_path / "dataset" / "train_generated"
    assert sorted(p.name for p in out.glob("img_*.jpg")) == [
        f"img_{i:06d}.jpg" for i in range(3)]
    assert sorted(p.name for p in out.glob("mask_*.png")) == [
        f"mask_{i:06d}.png" for i in range(3)]
    for b in (a.ok_btn, a.skip_btn, a.retrain_btn, a.generate_btn):
        assert b.state == "normal"
