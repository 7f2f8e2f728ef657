"""Postprocess: Butterworth + remove_fs goldens, BVH round trip, IK fitting."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.core import params, rotations as rot
from motionstyle.core.skeleton import Skeleton
from motionstyle.data.masks import XIA_BVH_JOINT_NAMES
from motionstyle.post import footskate
from motionstyle.post.bvh import Anim, extract_chains, read_bvh, save_bvh
from motionstyle.post.ik import fit_hmlvec_ik, fit_joints_bvh, fit_quats_ik

XIA = Skeleton(params.xia_raw_offsets, params.xia_kinematic_chain)
EE = ["rtoes", "ltoes", "lfoot", "rfoot"]


class TestFootskate:
    def test_butterworth_golden(self, goldens):
        g = goldens["postprocess"]
        out = footskate.butterworth(g["sig"].copy(), 1 / 20, 3)
        np.testing.assert_allclose(out, g["bw"], atol=1e-10)

    def test_remove_fs_vel3_golden(self, goldens):
        g = goldens["postprocess"]
        out, vels, contacts, _ = footskate.remove_fs(
            g["walk"].copy(), g["walk"].copy(), XIA_BVH_JOINT_NAMES, EE,
            force_on_floor=True, use_vel3=True, vel3_thr=0.05, after_butterworth=True,
        )
        np.testing.assert_array_equal(contacts, g["fs_contacts"])
        np.testing.assert_allclose(vels, g["fs_vels"], atol=1e-10)
        np.testing.assert_allclose(out, g["fs_out"], atol=1e-8)

    def test_remove_fs_velacc_golden(self, goldens):
        g = goldens["postprocess"]
        out, _, contacts, _ = footskate.remove_fs(
            g["walk"].copy(), g["walk"].copy(), XIA_BVH_JOINT_NAMES, EE,
            force_on_floor=False, use_window=False,
        )
        np.testing.assert_array_equal(contacts, g["fs2_contacts"])
        np.testing.assert_allclose(out, g["fs2_out"], atol=1e-8)


class TestBVH:
    def _make_anim(self, T=6):
        r = np.random.RandomState(0)
        q = r.randn(T, 20, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[..., 0] < 0] *= -1
        offsets = params.xia_real_offsets.copy()
        pos = np.tile(offsets[None], (T, 1, 1)).astype(np.float32)
        pos[:, 0] = r.randn(T, 3)
        parents = np.asarray(XIA.parents)
        return Anim(q, pos, offsets, parents, list(XIA_BVH_JOINT_NAMES))

    def test_round_trip(self, tmp_path):
        # BVH stores joints in hierarchy DFS order, so round-tripping may
        # permute indices; map back via (unique) bone names.
        anim = self._make_anim()
        path = str(tmp_path / "test.bvh")
        save_bvh(path, anim, 1 / 20)
        anim2 = read_bvh(path)
        assert sorted(anim2.bones) == sorted(anim.bones)
        perm = [anim2.bones.index(n) for n in anim.bones]
        # parent-name relationships preserved
        for j2, p2 in enumerate(anim2.parents):
            j1 = anim.bones.index(anim2.bones[j2])
            p1 = anim.parents[j1]
            assert (p2 < 0) == (p1 < 0)
            if p2 >= 0:
                assert anim2.bones[p2] == anim.bones[p1]
        np.testing.assert_allclose(anim2.offsets[perm], anim.offsets, atol=1e-5)
        np.testing.assert_allclose(anim2.pos[:, 0], anim.pos[:, 0], atol=1e-5)
        d = np.abs(np.sum(anim2.quats[:, perm] * anim.quats, axis=-1))
        np.testing.assert_allclose(d, 1.0, atol=1e-4)

    def test_round_trip_per_joint_orders(self, tmp_path):
        """Writing mixed per-joint euler orders and reading them back must
        recover the same rotations (per-joint CHANNELS parsing — superset of
        the reference's single global order, bvh_utils.py:84-295)."""
        anim = self._make_anim()
        J = anim.quats.shape[1]
        all_orders = ["zyx", "xyz", "zxy", "xzy", "yxz", "yzx"]
        orders = [all_orders[j % len(all_orders)] for j in range(J)]
        path = str(tmp_path / "mixed.bvh")
        save_bvh(path, anim, 1 / 20, order=orders)
        anim2 = read_bvh(path)
        perm = [anim2.bones.index(n) for n in anim.bones]
        d = np.abs(np.sum(anim2.quats[:, perm] * anim.quats, axis=-1))
        np.testing.assert_allclose(d, 1.0, atol=1e-4)
        # the declared orders actually differ per joint in the file
        chans = [l for l in open(path) if "CHANNELS" in l]
        assert len({l.split("CHANNELS")[1].strip() for l in chans}) > 2

    def test_corrupt_motion_row_raises(self, tmp_path):
        """A non-numeric line inside the MOTION table must raise, not
        silently truncate — the native strtof pass stops at the first bad
        byte, and a garbage line at a ROW BOUNDARY keeps the float count
        divisible by n_cols, so only an exact-count check catches it."""
        anim = self._make_anim()
        path = str(tmp_path / "ok.bvh")
        save_bvh(path, anim, 1 / 20)
        lines = open(path).read().splitlines(keepends=True)
        first_row = next(i for i, l in enumerate(lines)
                         if l.startswith("Frame Time")) + 1
        bad = lines[:first_row + 2] + ["corrupted @@@ line\n"] + \
            lines[first_row + 2:]
        badpath = str(tmp_path / "bad.bvh")
        open(badpath, "w").write("".join(bad))
        with pytest.raises(ValueError):
            read_bvh(badpath)

    def test_parser_format_variants(self, tmp_path):
        """Real-world BVH format variants: 'End Site {' brace on the same
        line, OFFSET in %e notation with '+' exponents, 'Frames:' without a
        space — all must parse to the same skeleton as the canonical form."""
        anim = self._make_anim()
        path = str(tmp_path / "canon.bvh")
        save_bvh(path, anim, 1 / 20)
        text = open(path).read()
        import re as _re
        # fold every 'End Site' block opener onto one line
        variant = _re.sub(r"End Site\s*\n\s*\{", "End Site {", text)
        variant = variant.replace("Frames: ", "Frames:")
        variant = _re.sub(
            r"OFFSET ([-\d.e]+) ([-\d.e]+) ([-\d.e]+)",
            lambda m: "OFFSET " + " ".join(
                f"{float(g):e}" for g in m.groups()),
            variant)
        assert "e+" in variant  # the %e form actually exercises '+'
        vpath = str(tmp_path / "variant.bvh")
        open(vpath, "w").write(variant)
        a = read_bvh(path)
        b = read_bvh(vpath)
        assert a.bones == b.bones
        np.testing.assert_array_equal(a.parents, b.parents)
        np.testing.assert_allclose(b.offsets, a.offsets, atol=1e-5)
        np.testing.assert_allclose(b.quats, a.quats, atol=1e-5)

    def test_motion_frames_wrapped_across_lines(self, tmp_path):
        """Exporters may wrap a frame's floats over several physical lines;
        the header-declared frame count disambiguates that from a truncated
        table (which still raises)."""
        anim = self._make_anim()
        path = str(tmp_path / "ok.bvh")
        save_bvh(path, anim, 1 / 20)
        lines = open(path).read().splitlines()
        first_row = next(i for i, l in enumerate(lines)
                         if l.startswith("Frame Time")) + 1
        row = lines[first_row].split()
        half = len(row) // 2
        wrapped = lines[:first_row] + [" ".join(row[:half]),
                                       " ".join(row[half:])] + \
            lines[first_row + 1:]
        wpath = str(tmp_path / "wrapped.bvh")
        open(wpath, "w").write("\n".join(wrapped) + "\n")
        a, b = read_bvh(path), read_bvh(wpath)
        np.testing.assert_allclose(b.quats, a.quats, atol=1e-5)
        np.testing.assert_allclose(b.pos, a.pos, atol=1e-5)

    def test_save_bvh_keeps_anim_frametime(self, tmp_path):
        anim = self._make_anim()
        anim.frametime = 1 / 60
        path = str(tmp_path / "ft.bvh")
        save_bvh(path, anim)  # no explicit frametime -> anim's own
        assert abs(read_bvh(path).frametime - 1 / 60) < 1e-6

    def test_read_bvh_order_override(self, tmp_path):
        """The reference-API `order` argument overrides declared channels."""
        anim = self._make_anim()
        path = str(tmp_path / "o.bvh")
        save_bvh(path, anim, 1 / 20, order="xyz")
        a_auto = read_bvh(path)
        a_forced = read_bvh(path, order="xyz")
        np.testing.assert_allclose(a_auto.quats, a_forced.quats, atol=1e-6)

    def test_fk_consistency_after_round_trip(self, tmp_path):
        anim = self._make_anim()
        path = str(tmp_path / "t.bvh")
        save_bvh(path, anim, 1 / 20)
        anim2 = read_bvh(path)
        perm = [anim2.bones.index(n) for n in anim.bones]
        _, gp1 = rot.quat_fk(jnp.asarray(anim.quats), jnp.asarray(anim.pos), list(anim.parents))
        _, gp2 = rot.quat_fk(jnp.asarray(anim2.quats), jnp.asarray(anim2.pos), list(anim2.parents))
        np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2)[:, perm], atol=1e-4)

    def test_extract_chains(self):
        anim = self._make_anim()
        chains, unit, real = extract_chains(anim)
        covered = sorted(set(j for c in chains for j in c))
        assert covered == list(range(20))
        np.testing.assert_allclose(real, anim.offsets)


class TestIK:
    def test_hmlvec_ik_reduces_error(self, goldens):
        g = goldens["features"]
        from motionstyle.core.features import recover_root_rot_pos

        data = jnp.asarray(g["feats"][0], dtype=jnp.float32)  # (76, 181)
        target = jnp.asarray(g["rec_real"][0]) + 0.02  # shifted target
        offs = jnp.asarray(params.xia_real_offsets)
        r_rot_quat, r_pos = recover_root_rot_pos(data)
        before = XIA.forward_kinematics_real_cont6d(
            data[..., 4 + 19 * 3 :].reshape(76, 20, 6), r_pos, r_rot_quat, offs
        )
        res = fit_hmlvec_ik(data, XIA, offs, target, iters=60)
        after = XIA.forward_kinematics_real_cont6d(res.cont6d, res.r_pos, res.r_rot_quat, offs)
        err_before = float(jnp.abs(before - target).mean())
        err_after = float(jnp.abs(after - target).mean())
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_fit_joints_bvh_writes_file(self, goldens, tmp_path):
        g = goldens["features"]
        data = g["feats"][0][:10]
        target = g["rec_real"][0][:10]
        path = str(tmp_path / "fit.bvh")
        fit_joints_bvh(path, data, XIA, params.xia_real_offsets, target,
                       names=XIA_BVH_JOINT_NAMES, iter_num=10)
        assert os.path.exists(path)
        anim = read_bvh(path)
        assert anim.shape == (10, 20)

    def test_quats_ik(self):
        r = np.random.RandomState(0)
        q = r.randn(4, 8, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pos = r.randn(4, 8, 3).astype(np.float32)
        parents = [-1, 0, 1, 2, 1, 4, 1, 6]
        _, target = rot.quat_fk(jnp.asarray(q), jnp.asarray(pos), parents)
        # perturb and recover
        q2 = q + r.randn(*q.shape).astype(np.float32) * 0.1
        c6 = fit_quats_ik(jnp.asarray(q2), jnp.asarray(pos), parents, target, iters=100, lr=1e-2)
        qf = rot.cont6d_to_quaternion(c6)
        _, got = rot.quat_fk(qf, jnp.asarray(pos), parents)
        _, init = rot.quat_fk(jnp.asarray(q2 / np.linalg.norm(q2, axis=-1, keepdims=True)), jnp.asarray(pos), parents)
        assert float(jnp.abs(got - target).mean()) < float(jnp.abs(init - target).mean())


class TestRender:
    def test_pyrender_path_with_stub(self, tmp_path, monkeypatch):
        """Exercise the opt-in pyrender mesh renderer against a minimal stub
        of the pyrender/trimesh API (the real packages are not installed);
        catches call-signature drift in _render_mesh_frames_pyrender."""
        import sys
        import types

        calls = {"render": 0, "deleted": 0}

        class _Obj:
            def __init__(self, *a, **k):
                pass

        class _Scene(_Obj):
            def add(self, obj, pose=None):
                pass

        class _Mesh(_Obj):
            @staticmethod
            def from_trimesh(tri, material=None, smooth=True):
                return _Obj()

        class _Renderer:
            def __init__(self, w, h):
                self.w, self.h = w, h

            def render(self, scene, flags=0):
                calls["render"] += 1
                return (np.zeros((self.h, self.w, 4), np.uint8), None)

            def delete(self):
                calls["deleted"] += 1

        pyrender = types.ModuleType("pyrender")
        pyrender.OffscreenRenderer = _Renderer
        pyrender.MetallicRoughnessMaterial = _Obj
        pyrender.Scene = _Scene
        pyrender.Mesh = _Mesh
        pyrender.DirectionalLight = _Obj
        pyrender.PerspectiveCamera = _Obj
        constants = types.ModuleType("pyrender.constants")
        constants.RenderFlags = types.SimpleNamespace(RGBA=2048)
        pyrender.constants = constants
        trimesh_mod = types.ModuleType("trimesh")
        trimesh_mod.Trimesh = _Obj
        monkeypatch.setitem(sys.modules, "pyrender", pyrender)
        monkeypatch.setitem(sys.modules, "pyrender.constants", constants)
        monkeypatch.setitem(sys.modules, "trimesh", trimesh_mod)

        from motionstyle.post.render import render_mesh_frames

        verts = np.random.RandomState(0).randn(50, 3, 4).astype(np.float32)
        out = render_mesh_frames(verts, faces=np.zeros((2, 3), int),
                                 save_path=str(tmp_path / "mesh.mp4"))
        assert calls["render"] == 4 and calls["deleted"] == 1
        assert out.endswith(".gif") and os.path.exists(out)

    def test_plot_3d_motion_writes_video(self, goldens, tmp_path):
        g = goldens["features"]
        joints = g["rec_ric"][0][:5]
        out = str(tmp_path / "clip.mp4")
        from motionstyle.post.render import plot_3d_motion

        plot_3d_motion(out, params.xia_kinematic_chain, joints, title="t", fps=20)
        files = os.listdir(tmp_path)
        assert any(f.startswith("clip.") for f in files), files
