"""Narrowphase collision: robot collision spheres vs. the Scene.

TPU-native replacement for Bullet's broadphase + narrowphase inside
``stepSimulation`` and for ``getContactPoints`` (SURVEY.md §2.3). There is no
broadphase at all: robot geometry is canonicalized to a static, small set of
spheres (models/schema.py) and every sphere tests against every scene feature
every substep, branchlessly — at locomotion scale (≤ ~16 spheres, ≤ ~32
stones) brute force in registers beats any tree walk on this hardware.

Exactly one candidate contact per sphere is emitted (the deepest across scene
features), so the contact count is static (= number of spheres) and the
constraint system never changes shape — the property that keeps the whole
step compilable once (SURVEY.md §7.3 hard part #1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from mocca_envs_tpu.models.schema import RobotModel
from mocca_envs_tpu.ops.kinematics import FrameData
from mocca_envs_tpu.terrain.scene import (
    Scene,
    hf_normal,
    hf_sample,
    sphere_box_depth,
    sphere_capsule_depth,
    sphere_triangle_depth,
)


class Contacts(struct.PyTreeNode):
    """Static-shape contact set for one env: one row per collision sphere."""

    pos: jnp.ndarray     # (ns, 3) world contact point (on surface)
    normal: jnp.ndarray  # (ns, 3) world normal, pointing *into* the robot
    depth: jnp.ndarray   # (ns,)   penetration depth (> 0 ⇒ touching)
    link: jnp.ndarray    # (ns,)   owning robot link (static values)
    active: jnp.ndarray  # (ns,)   1.0 where depth > -margin

    @property
    def count(self) -> int:
        return self.depth.shape[0]


def sphere_centers(model: RobotModel, fd: FrameData) -> jnp.ndarray:
    """World positions of all collision spheres: (ns, 3)."""
    R = fd.rot[model.sph_link]          # (ns, 3, 3)
    p = fd.pos[model.sph_link]          # (ns, 3)
    return p + jnp.einsum("sij,sj->si", R, model.sph_pos)


def collide(model: RobotModel, fd: FrameData, scene: Scene, margin: float) -> Contacts:
    centers = sphere_centers(model, fd)                      # (ns, 3)
    r = model.sph_radius                                     # (ns,)
    big_neg = jnp.asarray(-1e9, dtype=centers.dtype)

    best_depth = jnp.full_like(r, big_neg)
    best_normal = jnp.tile(jnp.array([0.0, 0.0, 1.0], dtype=centers.dtype), (r.shape[0], 1))
    best_pos = centers

    if scene.has_ground:
        depth = r - (centers[:, 2] - scene.ground_z)
        normal = jnp.tile(jnp.array([0.0, 0.0, 1.0], dtype=centers.dtype), (r.shape[0], 1))
        pos = centers.at[:, 2].add(-(centers[:, 2] - scene.ground_z))
        take = depth > best_depth
        best_depth = jnp.where(take, depth, best_depth)
        best_normal = jnp.where(take[:, None], normal, best_normal)
        best_pos = jnp.where(take[:, None], pos, best_pos)

    if scene.has_hf:
        h = hf_sample(scene, centers[:, :2])
        n = hf_normal(scene, centers[:, :2])
        # depth along the surface normal of the point below the center
        depth = r - (centers[:, 2] - h) * n[:, 2]
        pos = jnp.concatenate([centers[:, :2], h[:, None]], axis=1)
        take = depth > best_depth
        best_depth = jnp.where(take, depth, best_depth)
        best_normal = jnp.where(take[:, None], n, best_normal)
        best_pos = jnp.where(take[:, None], pos, best_pos)

    if scene.has_stones:
        def one_sphere(c, rad):
            d, n, p = jax.vmap(
                lambda sp, sq, sh: sphere_box_depth(c, rad, sp, sq, sh)
            )(scene.stone_pos, scene.stone_quat, scene.stone_half)
            d = jnp.where(scene.stone_active > 0.5, d, big_neg)
            k = jnp.argmax(d)
            return d[k], n[k], p[k]

        depth, normal, pos = jax.vmap(one_sphere)(centers, r)
        take = depth > best_depth
        best_depth = jnp.where(take, depth, best_depth)
        best_normal = jnp.where(take[:, None], normal, best_normal)
        best_pos = jnp.where(take[:, None], pos, best_pos)

    if scene.has_tris:
        # static triangle mesh (pybullet GEOM_MESH parity, SURVEY.md §2.3):
        # deepest face per sphere, same merge rule as the other features
        def one_sphere_tri(c, rad):
            d, n, p = jax.vmap(
                lambda ta, tb, tc: sphere_triangle_depth(c, rad, ta, tb, tc)
            )(scene.tri_a, scene.tri_b, scene.tri_c)
            d = jnp.where(scene.tri_active > 0.5, d, big_neg)
            k = jnp.argmax(d)
            return d[k], n[k], p[k]

        depth, normal, pos = jax.vmap(one_sphere_tri)(centers, r)
        take = depth > best_depth
        best_depth = jnp.where(take, depth, best_depth)
        best_normal = jnp.where(take[:, None], normal, best_normal)
        best_pos = jnp.where(take[:, None], pos, best_pos)

    if scene.has_bars:
        def one_sphere_bar(c, rad):
            d, n, p = jax.vmap(
                lambda a, b2, rb: sphere_capsule_depth(c, rad, a, b2, rb)
            )(scene.bar_a, scene.bar_b, scene.bar_r)
            d = jnp.where(scene.bar_active > 0.5, d, big_neg)
            k = jnp.argmax(d)
            return d[k], n[k], p[k]

        depth, normal, pos = jax.vmap(one_sphere_bar)(centers, r)
        # grabbing palms wrap the bar — excluded from bar push-out (B8)
        depth = jnp.where(model.sph_no_bar > 0.5, big_neg, depth)
        take = depth > best_depth
        best_depth = jnp.where(take, depth, best_depth)
        best_normal = jnp.where(take[:, None], normal, best_normal)
        best_pos = jnp.where(take[:, None], pos, best_pos)

    active = (best_depth > -margin).astype(centers.dtype)
    return Contacts(
        pos=best_pos,
        normal=best_normal,
        depth=best_depth,
        link=model.sph_link,
        active=active,
    )


def foot_contact_flags(model: RobotModel, contacts: Contacts) -> jnp.ndarray:
    """Binary per-foot ground-contact flags for observations.

    Reference behavior B4: ``calc_state`` appends foot contact booleans from
    ``getContactPoints`` (SURVEY.md §2.2). A foot is "in contact" when any of
    its spheres penetrates.
    """
    touching = (contacts.depth > 0.0).astype(contacts.depth.dtype)  # (ns,)
    per_foot = jnp.einsum("s,sf->f", touching * contacts.active, model.sph_foot)
    return (per_foot > 0.0).astype(contacts.depth.dtype)


def link_contact_mask(model: RobotModel, contacts: Contacts) -> jnp.ndarray:
    """Per-link any-contact flags (nl,) — feeds termination tests.

    Replaces the reference's body-ground ``getContactPoints`` termination
    queries (behavior B5: episode ends on torso/ground contact).
    """
    touching = (contacts.depth > 0.0) & (contacts.active > 0.5)
    return jnp.zeros(model.nl, dtype=contacts.depth.dtype).at[contacts.link].max(
        touching.astype(contacts.depth.dtype)
    )
