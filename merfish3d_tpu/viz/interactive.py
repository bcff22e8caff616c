"""Interactive viewer shell (matplotlib widgets).

The reference `Qi2labViewer` is an ndv/PyQt read-only GUI
(`viewer.py:1250-1275`); neither ndv nor Qt exists in this environment,
so the interactive shell is built on matplotlib's widget toolkit (TkAgg
when a display is available, Agg headless for tests) over the same data
layer (`viz/viewer.py`): per-tile channel stacks with lazy loading,
decoded-spot and cell-outline overlays, a global fused view, z/channel
sliders, tile paging, and keyboard bindings.

All state transitions are plain methods (`set_z`, `set_channel`,
`next_tile`, `toggle_spots`, ...) so the shell is fully drivable headless
— the widgets and key bindings just call them.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..utils.cache import LoaderCache as _VolumeCache
from . import viewer as data_layer




class MatplotlibViewer:
    """Read-only interactive datastore viewer.

    Views: one per tile (fiducial + per-bit channels) plus a ``global``
    view when a fused volume exists. Channels load lazily (LRU of 4
    volumes) so flipping through 16-bit experiments doesn't pull every
    volume into RAM up front.
    """

    GLOBAL = "global"

    def __init__(
        self,
        datastore,
        *,
        tile: Optional[str] = None,
        backend: Optional[str] = None,
        spot_overlays: bool = True,
        outline_overlays: bool = True,
    ):
        import matplotlib

        if backend is not None:
            matplotlib.use(backend, force=True)
        else:
            try:
                matplotlib.use("TkAgg", force=True)
            except Exception:
                matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        self._plt = plt
        self._ds = datastore
        self._cache = _VolumeCache()
        self._overlay_cache = _VolumeCache(capacity=2)

        self._views = list(datastore.tile_ids or [])
        if data_layer.global_fused_available(datastore):
            self._views.append(self.GLOBAL)
        if not self._views:
            raise ValueError("datastore has no tiles to display")
        self._view_idx = (
            self._views.index(tile) if tile in self._views else 0
        )
        self._channel_idx = 0
        self._z = 0
        self._show_spots = bool(spot_overlays)
        self._show_outlines = bool(outline_overlays)

        self._build_figure()
        self._refresh(autoscale=True)

    # ------------------------------------------------------------ channels
    @property
    def view(self) -> str:
        return self._views[self._view_idx]

    def _channel_descriptors(self) -> list[tuple[str, Callable]]:
        ds = self._ds
        view = self.view
        if view == self.GLOBAL:
            def _fused():
                out = ds.load_global_fiducial_image()
                return None if out is None else np.asarray(out[0], np.float32)

            return [("global fused fiducial", _fused)]
        descs: list[tuple[str, Callable]] = []
        round_ids = list(ds.round_ids or [])
        if round_ids:
            rid = round_ids[0]
            descs.append(
                (
                    f"{view}:{rid}:fiducial",
                    lambda: _first_available(
                        lambda: ds.load_local_registered_image(tile=view, round=rid),
                        lambda: ds.load_local_corrected_image(tile=view, round=rid),
                    ),
                )
            )
        for bit_id in list(ds.bit_ids or []):
            descs.append(
                (
                    f"{view}:{bit_id}:decon",
                    lambda b=bit_id: _first_available(
                        lambda: ds.load_local_registered_image(tile=view, bit=b),
                        lambda: ds.load_local_corrected_image(tile=view, bit=b),
                    ),
                )
            )
            descs.append(
                (
                    f"{view}:{bit_id}:probability",
                    lambda b=bit_id: _maybe(
                        ds.load_local_feature_predictor_image(tile=view, bit=b)
                    ),
                )
            )
        return descs

    def _current_volume(self) -> Optional[np.ndarray]:
        descs = self._channel_descriptors()
        self._channel_idx %= max(len(descs), 1)
        label, loader = descs[self._channel_idx]
        return self._cache.get(label, loader)

    def _current_label(self) -> str:
        descs = self._channel_descriptors()
        return descs[self._channel_idx % max(len(descs), 1)][0]

    # ------------------------------------------------------------ overlays
    def _spot_overlay(self, shape_zyx):
        view = self.view
        if view == self.GLOBAL:
            fused = self._ds.load_global_fiducial_image()
            if fused is None:
                return None
            _, (affine, origin, spacing) = fused

            return self._overlay_cache.get(
                "global:spots",
                lambda: data_layer.global_decoded_overlay(
                    self._ds, shape_zyx, origin, spacing
                ),
            )
        return self._overlay_cache.get(
            f"{view}:spots",
            lambda: data_layer.decoded_overlay_for_tile(self._ds, view, shape_zyx),
        )

    def _outline_overlay(self, shape_zyx):
        view = self.view
        try:
            if view == self.GLOBAL:
                fused = self._ds.load_global_fiducial_image()
                if fused is None:
                    return None
                _, (affine, origin, spacing) = fused
                return data_layer.global_cell_outline_overlay(
                    self._ds, shape_zyx, origin, spacing
                )
            return data_layer.cell_outline_overlay_for_tile(
                self._ds, view, shape_zyx
            )
        except Exception:
            return None

    # -------------------------------------------------------------- figure
    def _build_figure(self) -> None:
        plt = self._plt
        from matplotlib.widgets import Button, CheckButtons, Slider

        self.fig = plt.figure(figsize=(10, 8))
        self.ax = self.fig.add_axes([0.05, 0.18, 0.72, 0.78])
        self.ax.set_axis_off()
        self._im = None
        self._im_spots = None
        self._im_outlines = None

        ax_z = self.fig.add_axes([0.1, 0.09, 0.6, 0.03])
        self._z_slider = Slider(ax_z, "z", 0, 1, valinit=0, valstep=1)
        self._z_slider.on_changed(lambda v: self.set_z(int(v)))

        ax_c = self.fig.add_axes([0.1, 0.04, 0.6, 0.03])
        self._c_slider = Slider(ax_c, "channel", 0, 1, valinit=0, valstep=1)
        self._c_slider.on_changed(lambda v: self.set_channel(int(v)))

        ax_checks = self.fig.add_axes([0.8, 0.45, 0.18, 0.12])
        self._checks = CheckButtons(
            ax_checks,
            ["decoded spots", "cell outlines"],
            [self._show_spots, self._show_outlines],
        )
        self._checks.on_clicked(self._on_check)

        ax_prev = self.fig.add_axes([0.8, 0.3, 0.08, 0.05])
        ax_next = self.fig.add_axes([0.89, 0.3, 0.08, 0.05])
        self._btn_prev = Button(ax_prev, "◀ tile")
        self._btn_next = Button(ax_next, "tile ▶")
        self._btn_prev.on_clicked(lambda _e: self.prev_view())
        self._btn_next.on_clicked(lambda _e: self.next_view())

        self.fig.canvas.mpl_connect("key_press_event", self._on_key)

    # ------------------------------------------------------------- actions
    def set_z(self, z: int) -> None:
        self._z = int(z)
        self._refresh()

    def set_channel(self, c: int) -> None:
        self._channel_idx = int(c)
        self._refresh(autoscale=True)

    def next_view(self) -> None:
        self._view_idx = (self._view_idx + 1) % len(self._views)
        self._channel_idx = 0
        self._refresh(autoscale=True)

    def prev_view(self) -> None:
        self._view_idx = (self._view_idx - 1) % len(self._views)
        self._channel_idx = 0
        self._refresh(autoscale=True)

    def toggle_spots(self) -> None:
        self._show_spots = not self._show_spots
        self._refresh()

    def toggle_outlines(self) -> None:
        self._show_outlines = not self._show_outlines
        self._refresh()

    def _on_check(self, label: str) -> None:
        if label == "decoded spots":
            self.toggle_spots()
        else:
            self.toggle_outlines()

    def _on_key(self, event) -> None:
        if event.key == "up":
            self.set_z(self._z + 1)
        elif event.key == "down":
            self.set_z(self._z - 1)
        elif event.key == "right":
            self.set_channel(self._channel_idx + 1)
        elif event.key == "left":
            self.set_channel(self._channel_idx - 1)
        elif event.key == "t":
            self.next_view()
        elif event.key == "o":
            self.toggle_spots()

    # -------------------------------------------------------------- render
    def current_frame(self) -> Optional[np.ndarray]:
        vol = self._current_volume()
        if vol is None:
            return None
        vol = data_layer._as_zyx(vol)
        self._z = int(np.clip(self._z, 0, vol.shape[0] - 1))
        return np.asarray(vol[self._z], np.float32)

    def _refresh(self, autoscale: bool = False) -> None:
        frame = self.current_frame()
        descs = self._channel_descriptors()
        vol = self._current_volume()
        nz = 1 if vol is None else data_layer._as_zyx(vol).shape[0]

        # keep slider ranges in sync without re-entrant callbacks
        self._z_slider.valmax = max(nz - 1, 1)
        self._z_slider.ax.set_xlim(0, max(nz - 1, 1))
        self._c_slider.valmax = max(len(descs) - 1, 1)
        self._c_slider.ax.set_xlim(0, max(len(descs) - 1, 1))

        if frame is None:
            self.ax.set_title(f"{self._current_label()} (unavailable)")
            self.fig.canvas.draw_idle()
            return
        if self._im is None or self._im.get_array().shape != frame.shape:
            self.ax.clear()
            self.ax.set_axis_off()
            self._im = self.ax.imshow(frame, cmap="gray", interpolation="nearest")
            self._im_spots = None
            self._im_outlines = None
        else:
            self._im.set_data(frame)
        if autoscale:
            lo, hi = np.percentile(frame, (1, 99.9))
            self._im.set_clim(lo, max(hi, lo + 1))

        shape_zyx = data_layer._as_zyx(self._current_volume()).shape
        self._render_overlay(
            "_im_spots",
            self._spot_overlay(shape_zyx) if self._show_spots else None,
            (1.0, 0.1, 0.1, 0.9),
        )
        outline = None
        if self._show_outlines:
            ov = self._outline_overlay(shape_zyx)
            outline = ov
        self._render_overlay("_im_outlines", outline, (0.1, 0.8, 1.0, 0.9))

        self.ax.set_title(f"{self._current_label()}  z={self._z}/{nz - 1}")
        self.fig.canvas.draw_idle()

    def _render_overlay(self, attr: str, overlay, rgba) -> None:
        im = getattr(self, attr)
        if overlay is None:
            if im is not None:
                im.set_visible(False)
            return
        overlay = np.asarray(overlay)
        plane = overlay[min(self._z, overlay.shape[0] - 1)] if overlay.ndim == 3 else overlay
        rgba_img = np.zeros((*plane.shape, 4), np.float32)
        mask = plane > 0
        rgba_img[mask] = rgba
        if im is None or im.get_array().shape[:2] != plane.shape:
            setattr(
                self,
                attr,
                self.ax.imshow(rgba_img, interpolation="nearest"),
            )
        else:
            im.set_data(rgba_img)
            im.set_visible(True)

    def show(self) -> None:
        self._plt.show()

    def savefig(self, path) -> None:
        self.fig.savefig(path, dpi=120)

    def close(self) -> None:
        self._plt.close(self.fig)


def _first_available(*loaders):
    for loader in loaders:
        out = loader()
        if out is not None:
            return np.asarray(out, np.float32)
    return None


def _maybe(value):
    return None if value is None else np.asarray(value, np.float32)
