"""Headless recording: frame sequences -> GIF / PNG sequence / mp4
(reference: src/VideoRecorder.h:12-29 — ffmpeg-subprocess H.264 at a fixed fps — and
the deterministic fixed-step headless capture of --record/--render, README.md:163-197).

mp4 uses an ffmpeg subprocess exactly like the reference when one is on PATH; the
always-available fallbacks are animated GIF (PIL) and numbered PNG frames. Frames are
rendered fixed-step, so recordings are deterministic corpus artifacts.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import numpy as np


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_frames(path_base, frames) -> list:
    """Numbered PNG frames `<base>_0000.png ...` (the render-corpus form)."""
    from PIL import Image

    base = Path(path_base)
    out = []
    for i, f in enumerate(frames):
        p = base.with_name(f"{base.stem}_{i:04d}.png")
        Image.fromarray(_to_u8(f)).save(p, format="PNG")
        out.append(p)
    return out


def write_gif(path, frames, fps: float = 30.0) -> None:
    """Animated GIF via PIL (no external encoder needed)."""
    from PIL import Image

    ims = [Image.fromarray(_to_u8(f)) for f in frames]
    ims[0].save(
        str(path), save_all=True, append_images=ims[1:],
        duration=max(int(round(1000.0 / fps)), 1), loop=0,
    )


def write_mp4(path, frames, fps: float = 60.0) -> bool:
    """H.264 via an ffmpeg subprocess (the reference's encoder path,
    VideoRecorder.h:12-29). Returns False when ffmpeg is not available."""
    if shutil.which("ffmpeg") is None:
        return False
    frames = [np.ascontiguousarray(_to_u8(f)) for f in frames]
    h, w = frames[0].shape[:2]
    proc = subprocess.Popen(
        ["ffmpeg", "-y", "-loglevel", "error", "-f", "rawvideo", "-pix_fmt", "rgb24",
         "-s", f"{w}x{h}", "-r", str(fps), "-i", "-", "-c:v", "libx264",
         "-pix_fmt", "yuv420p", str(path)],
        stdin=subprocess.PIPE,
    )
    for f in frames:
        proc.stdin.write(f.tobytes())
    proc.stdin.close()
    return proc.wait() == 0


def record(path, frames, fps: float = 30.0) -> Path:
    """Write a recording, picking the encoder from the suffix (.mp4 needs ffmpeg and
    falls back to .gif beside it; .gif and .png always work)."""
    path = Path(path)
    frames = list(frames)
    if not frames:
        raise ValueError("no frames to record")
    if path.suffix == ".mp4":
        if write_mp4(path, frames, fps):
            return path
        path = path.with_suffix(".gif")
    if path.suffix == ".gif":
        write_gif(path, frames, fps)
        return path
    write_frames(path, frames)
    return path


def turntable_frames(positions, triangles, n_frames: int = 36, settings=None,
                     elevation_deg: float = 25.0, vertex_values=None):
    """Fixed-step orbit around a mesh (the reference's --play capture analog):
    yields one rendered frame per azimuth step, deterministically."""
    from .camera import frame_points
    from .scene_render import RenderSettings, render_mesh

    settings = settings or RenderSettings(width=320, height=240)
    positions = np.asarray(positions, np.float32)
    for i in range(n_frames):
        az = -60.0 + 360.0 * i / n_frames
        cam = frame_points(positions, azimuth_deg=az, elevation_deg=elevation_deg)
        yield render_mesh(positions, triangles, camera=cam, settings=settings,
                          vertex_values=vertex_values)


def animation_frames(registry, clip, camera=None, seconds: float | None = None,
                     fps: float = 30.0, settings=None, motion_blur_steps: int = 1,
                     shutter: float = 0.5):
    """Fixed-step clip playback: samples the animation clip (scene/animation.py) at
    the exact frame clock and renders each step — the deterministic headless capture
    discipline (README.md:182, fixed-step GPU-paced).

    motion_blur_steps > 1 renders that many substeps across the frame's shutter
    interval and averages them — the reference's multi-step BlurAccumulate resolve
    (src/viewport/ViewportRenderGpu.h:23-35), re-expressed as plain accumulation
    (deterministic; substep times are exact fractions of the frame clock)."""
    from ..scene.animation import evaluate_clip
    from ..scene.components import MeshSurface
    from .scene_render import RenderSettings, render_scene

    settings = settings or RenderSettings(width=320, height=240)
    if seconds is None:
        seconds = clip.duration
    n = max(int(round(seconds * fps)), 1)
    steps = max(int(motion_blur_steps), 1)

    def render_at(t):
        weights = evaluate_clip(registry, clip, t)
        for e, w in weights.items():
            surf = registry.get(e, MeshSurface)
            if surf is not None:
                surf.morph_weights = np.asarray(w, np.float64)
        return np.asarray(render_scene(registry, camera=camera,
                                       settings=settings).image())

    for i in range(n):
        if steps == 1:
            yield render_at(i / fps)
            continue
        acc = None
        for k in range(steps):
            t = (i + shutter * k / (steps - 1 if steps > 1 else 1)) / fps
            img = render_at(t)
            acc = img if acc is None else acc + img
        yield acc / steps
