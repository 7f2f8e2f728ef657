"""Stick-figure motion rendering to mp4/gif via matplotlib.

Parity: data_loaders/humanml/utils/plot_script.py (plot_3d_motion :30,
frame-coloring modes incl. inpainting highlight). Headless-safe (Agg);
falls back to pillow gifs when no ffmpeg binary is present.
"""
from __future__ import annotations

import os
import shutil
from typing import List, Optional

import numpy as np


def _colors_for_mode(vis_mode: str, painting_features: Optional[List[str]]):
    blue = ["#4D84AA", "#5B9965", "#61CEB9", "#34C1E2", "#80B79A"]
    orange = ["#DD5A37", "#D69E00", "#B75A39", "#FF6D00", "#DDB50E"]
    if vis_mode == "gt":
        return blue
    if vis_mode == "upper_body":
        return orange[:2] + blue[2:]
    return orange  # any inpainting mode highlights the whole figure


def plot_3d_motion(
    save_path: str,
    kinematic_tree,
    joints: np.ndarray,
    title: str = "",
    dataset: str = "stylexia_posrot",
    figsize=(3, 3),
    fps: float = 20,
    radius: float = 3,
    vis_mode: str = "default",
    gt_frames=(),
    painting_features: Optional[List[str]] = None,
):
    """joints: (T, J, 3) global positions -> animated mp4 (or gif fallback)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, FFMpegWriter, PillowWriter
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401

    data = joints.copy().reshape(len(joints), -1, 3)
    if dataset == "kit":
        data *= 0.003
    elif dataset in ("humanml",):
        data *= 1.3

    frame_number = data.shape[0]
    MINS, MAXS = data.min(axis=0).min(axis=0), data.max(axis=0).max(axis=0)
    colors = _colors_for_mode(vis_mode, painting_features)

    height_offset = MINS[1]
    data[:, :, 1] -= height_offset
    trajec = data[:, 0, [0, 2]]
    data[..., 0] -= data[:, 0:1, 0]
    data[..., 2] -= data[:, 0:1, 2]

    fig = plt.figure(figsize=figsize)
    plt.tight_layout()
    ax = fig.add_subplot(111, projection="3d")

    def init():
        ax.set_xlim3d([-radius / 2, radius / 2])
        ax.set_ylim3d([0, radius])
        ax.set_zlim3d([-radius / 3.0, radius * 2 / 3.0])
        fig.suptitle(title, fontsize=10)
        # matplotlib >= 3.6: grid(b=...) lands in **kwargs and is ignored
        # while `visible` defaults to True — must use visible=False
        ax.grid(visible=False)

    def plot_xz_plane(minx, maxx, miny, minz, maxz):
        verts = [[minx, miny, minz], [minx, miny, maxz], [maxx, miny, maxz], [maxx, miny, minz]]
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        xz_plane = Poly3DCollection([verts])
        xz_plane.set_facecolor((0.5, 0.5, 0.5, 0.5))
        ax.add_collection3d(xz_plane)

    def update(index):
        ax.clear()
        ax.grid(visible=False)
        ax.view_init(elev=120, azim=-90)
        # the reference's `ax.dist = 7.5` (plot_script.py) was removed in
        # matplotlib 3.7; zoom = default_dist / 7.5 reproduces the framing
        ax.set_box_aspect(None, zoom=10.0 / 7.5)
        ax.set_xlim3d([-radius / 2, radius / 2])
        ax.set_ylim3d([0, radius])
        ax.set_zlim3d([-radius / 3.0, radius * 2 / 3.0])
        plot_xz_plane(
            MINS[0] - trajec[index, 0], MAXS[0] - trajec[index, 0], 0,
            MINS[2] - trajec[index, 1], MAXS[2] - trajec[index, 1],
        )
        used_colors = _colors_for_mode("gt", None) if index in gt_frames else colors
        for i, (chain, color) in enumerate(zip(kinematic_tree, used_colors)):
            linewidth = 4.0 if i < 5 else 2.0
            ax.plot3D(
                data[index, chain, 0], data[index, chain, 1], data[index, chain, 2],
                linewidth=linewidth, color=color,
            )
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])

    ani = FuncAnimation(fig, update, frames=frame_number, interval=1000 / fps, repeat=False, init_func=init)
    os.makedirs(os.path.dirname(os.path.abspath(save_path)) or ".", exist_ok=True)
    if shutil.which("ffmpeg") and save_path.endswith(".mp4"):
        ani.save(save_path, writer=FFMpegWriter(fps=fps))
    else:
        alt = save_path if save_path.endswith(".gif") else save_path.rsplit(".", 1)[0] + ".gif"
        ani.save(alt, writer=PillowWriter(fps=min(fps, 20)))
    plt.close(fig)
    return save_path


def plot_3d_array(args) -> "np.ndarray":
    """Render a motion to an (T, H, W, 3) uint8 frame array (for logging GIFs
    in the training loop); parity: plot_script.py:314 (plot_3d_array).

    args = (joints (T, J, 3), title or None, kinematic_tree, extra...) — the
    reference passes a tuple; we accept (joints, title, kinematic_tree).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    joints, title, kinematic_tree = args[0], args[1], args[2]
    data = np.asarray(joints).reshape(len(joints), -1, 3).copy()
    data[:, :, 1] -= data[..., 1].min()
    frames = []
    fig = plt.figure(figsize=(3, 3))
    ax = fig.add_subplot(111, projection="3d")
    colors = _colors_for_mode("gt", None)
    for t in range(len(data)):
        ax.clear()
        ax.view_init(elev=120, azim=-90)
        for chain, color in zip(kinematic_tree, colors):
            ax.plot3D(data[t, chain, 0], data[t, chain, 1], data[t, chain, 2], color=color)
        if title:
            ax.set_title(str(title), fontsize=8)
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    return np.stack(frames)


def explicit_plot_3d_motion(save_path, kinematic_tree, joints, title="",
                            dataset="stylexia_posrot", figsize=(3, 3), fps=20,
                            radius=3, vis_mode="default", gt_frames=()):
    """Alias configuration of plot_3d_motion with explicit figure control;
    parity: plot_script.py:168."""
    return plot_3d_motion(save_path, kinematic_tree, joints, title=title,
                          dataset=dataset, figsize=figsize, fps=fps,
                          radius=radius, vis_mode=vis_mode, gt_frames=gt_frames)


def _render_mesh_frames_pyrender(verts: "np.ndarray", faces, save_path: str,
                                 fps: float) -> str:
    """Raytraced mesh video via pyrender, scene parity with the reference's
    live path (visualize/render_final.py:169-258): per-frame warm color ramp,
    MetallicRoughness BLEND material, three directional lights, perspective
    camera pitched -pi/6 looking down the +z setback, 960x960 RGBA @ fps 20.
    One OffscreenRenderer is reused across frames (the reference recreates it
    per frame, :245-254 — same output, less GL churn)."""
    import pyrender
    import trimesh
    from pyrender.constants import RenderFlags

    T = verts.shape[-1]
    mins = verts.min(axis=(0, 2))
    maxs = verts.max(axis=(0, 2))
    minx, maxx = mins[0] - 0.5, maxs[0] + 0.5
    minz = mins[2] - 0.5
    c = -np.pi / 6
    cam_pose = np.array([
        [1, 0, 0, (minx + maxx) / 2],
        [0, np.cos(c), -np.sin(c), 1.5],
        [0, np.sin(c), np.cos(c),
         max(4.0, minz + (1.5 - mins[1]) * 2, maxx - minx)],
        [0, 0, 0, 1],
    ])
    renderer = pyrender.OffscreenRenderer(960, 960)
    frames = []
    try:
        for i in range(T):
            tri = trimesh.Trimesh(vertices=verts[:, :, i], faces=faces)
            material = pyrender.MetallicRoughnessMaterial(
                metallicFactor=0.5, alphaMode="BLEND",
                baseColorFactor=[1.0, (145 + i * 0.8) / 255.0,
                                 (33 + i * 0.5) / 255.0, 0.9],
            )
            scene = pyrender.Scene(bg_color=[1, 1, 1, 0.8],
                                   ambient_light=(0.4, 0.4, 0.4))
            scene.add(pyrender.Mesh.from_trimesh(tri, material=material))
            light = pyrender.DirectionalLight(color=[1, 1, 1], intensity=300)
            for lx in ([0, -1, 1], [0, 1, 1], [1, 1, 2]):
                pose = np.eye(4)
                pose[:3, 3] = lx
                scene.add(light, pose=pose)
            scene.add(pyrender.PerspectiveCamera(yfov=np.pi / 3.0), pose=cam_pose)
            rgba, _ = renderer.render(scene, flags=RenderFlags.RGBA)
            frames.append(np.asarray(rgba))
    finally:
        renderer.delete()

    from PIL import Image

    alt = save_path if save_path.endswith(".gif") else save_path.rsplit(".", 1)[0] + ".gif"
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(alt, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / min(fps, 20)), loop=0)
    return alt


def render_mesh_frames(vertices: "np.ndarray", faces=None, save_path: str = "mesh.mp4",
                       fps: float = 20):
    """SMPL mesh video. Uses pyrender when installed (parity:
    visualize/render_final.py); otherwise a matplotlib point-cloud fallback
    so the export path always produces output."""
    try:
        import pyrender  # noqa: F401
        import trimesh  # noqa: F401

        have_pyrender = True
    except ImportError:
        have_pyrender = False
    # mesh rendering needs faces; a faces-less call is a point cloud and
    # must take the matplotlib scatter path even when pyrender is installed
    if have_pyrender and faces is not None:
        return _render_mesh_frames_pyrender(np.asarray(vertices), faces, save_path, fps)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    verts = np.asarray(vertices)  # (V, 3, T)
    fig = plt.figure(figsize=(3, 3))
    ax = fig.add_subplot(111, projection="3d")

    def update(i):
        ax.clear()
        ax.view_init(elev=110, azim=-90)
        ax.scatter(verts[:, 0, i], verts[:, 1, i], verts[:, 2, i], s=0.1)
        ax.set_axis_off()

    ani = FuncAnimation(fig, update, frames=verts.shape[-1], interval=1000 / fps)
    alt = save_path if save_path.endswith(".gif") else save_path.rsplit(".", 1)[0] + ".gif"
    ani.save(alt, writer=PillowWriter(fps=min(fps, 20)))
    plt.close(fig)
    return alt
