"""Hertz contact model closed forms (the reference's ContactModelTest discipline)."""

import numpy as np

from mesheditor_tpu.materials import CERAMIC, STEEL
from mesheditor_tpu.synth.contact import (
    MAX_CONTACT_TIME,
    MIN_CONTACT_TIME,
    ContactDynamics,
    Impactor,
    Striker,
    combined_curvature,
    contact_patch_radius,
    contact_stiffness,
    estimate_contact_time,
    inv_effective_modulus,
    inverse_inertia_tensor,
    reduced_contact_mass,
    static_penetration,
    striker_impactor,
    striker_mass,
)
from mesheditor_tpu.types import MassProperties


class TestStriker:
    def test_mass_is_capsule_volume_times_density(self):
        s = Striker(material=STEEL, tip_radius=0.01, length=0.19)
        rho = STEEL.properties.density
        expected = rho * np.pi * (0.01**2 * 0.19 + 4 / 3 * 0.01**3)
        assert abs(striker_mass(s) - expected) < 1e-12
        assert 0.4 < striker_mass(s) < 0.6  # ~0.5 kg of steel at defaults

    def test_impactor(self):
        imp = striker_impactor(Striker())
        assert abs(imp.curvature - 100.0) < 1e-9
        assert abs(imp.inv_mass - 1.0 / striker_mass(Striker())) < 1e-12


class TestHertzForms:
    def test_inv_effective_modulus(self):
        a, b = CERAMIC.properties, STEEL.properties
        expected = (1 - a.poisson_ratio**2) / a.young_modulus + (1 - b.poisson_ratio**2) / b.young_modulus
        assert abs(inv_effective_modulus(a, b) - expected) < 1e-24

    def test_stiffness_penetration_consistency(self):
        # N = k * delta0^(3/2) must hold exactly through the closed forms.
        inv_e = inv_effective_modulus(CERAMIC.properties, STEEL.properties)
        kappa = combined_curvature(10.0, 100.0)
        k = contact_stiffness(inv_e, kappa)
        for load in (0.1, 1.0, 16.0):
            delta0 = static_penetration(load, k)
            assert abs(k * delta0**1.5 - load) < 1e-9 * load

    def test_patch_radius_scaling(self):
        # a ~ N^(1/3): doubling the load scales the patch by 2^(1/3).
        inv_e = inv_effective_modulus(CERAMIC.properties, STEEL.properties)
        kappa = combined_curvature(10.0, 100.0)
        r1 = contact_patch_radius(1.0, inv_e, kappa)
        r2 = contact_patch_radius(2.0, inv_e, kappa)
        assert abs(r2 / r1 - 2 ** (1 / 3)) < 1e-12

    def test_flat_surface_curvature_floor(self):
        assert combined_curvature(-5.0, 2.0) == 1e-6


class TestReducedMass:
    def _dynamics(self):
        return ContactDynamics(
            mass=2.0,
            inverse_inertia=np.diag([10.0, 10.0, 10.0]),
            contact_arm=np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]]),
        )

    def test_center_hit_immovable_impactor(self):
        # Through the COM with an immovable impactor the reduced mass is the body mass.
        d = self._dynamics()
        imp = Impactor(material=STEEL.properties, curvature=0, inv_mass=0)
        assert abs(reduced_contact_mass(d, 0, np.array([0, 0, 1.0]), imp) - 2.0) < 1e-12

    def test_offcenter_leverage_reduces_mass(self):
        d = self._dynamics()
        imp = Impactor(material=STEEL.properties, curvature=0, inv_mass=0)
        m_center = reduced_contact_mass(d, 0, np.array([0, 0, 1.0]), imp)
        m_off = reduced_contact_mass(d, 1, np.array([0, 0, 1.0]), imp)
        # arm x n = (0.1,0,0) x (0,0,1) -> |.|^2 * 10 adds rotational compliance.
        expected = 1.0 / (0.5 + 0.01 * 10.0)
        assert m_off < m_center
        assert abs(m_off - expected) < 1e-12

    def test_light_impactor_dominates(self):
        d = self._dynamics()
        light = Impactor(material=STEEL.properties, curvature=0, inv_mass=100.0)
        m = reduced_contact_mass(d, 0, np.array([0, 0, 1.0]), light)
        assert m < 0.011  # ~1/inv_mass

    def test_invalid_index_is_zero(self):
        d = self._dynamics()
        imp = Impactor(material=STEEL.properties)
        assert reduced_contact_mass(d, 5, np.array([0, 0, 1.0]), imp) == 0.0


class TestContactTime:
    def test_clamped_to_bounds(self):
        d = ContactDynamics(mass=2.0, inverse_inertia=np.zeros((3, 3)),
                            contact_arm=np.zeros((1, 3)))
        imp = striker_impactor(Striker())
        tau = estimate_contact_time(d, 0, np.array([0, 0, 1.0]), 1.0,
                                    CERAMIC.properties, 10.0, imp)
        assert MIN_CONTACT_TIME <= tau <= MAX_CONTACT_TIME

    def test_speed_shortens_contact(self):
        d = ContactDynamics(mass=2.0, inverse_inertia=np.zeros((3, 3)),
                            contact_arm=np.zeros((1, 3)))
        imp = striker_impactor(Striker())
        slow = estimate_contact_time(d, 0, np.array([0, 0, 1.0]), 0.1,
                                     CERAMIC.properties, 10.0, imp)
        fast = estimate_contact_time(d, 0, np.array([0, 0, 1.0]), 10.0,
                                     CERAMIC.properties, 10.0, imp)
        assert fast < slow
        # tau ~ v^(-1/5)
        assert abs(slow / fast - 100 ** (1 / 5)) < 1e-6

    def test_degenerate_body_returns_min(self):
        d = ContactDynamics()
        imp = striker_impactor(Striker())
        tau = estimate_contact_time(d, 0, np.array([0, 0, 1.0]), 1.0,
                                    CERAMIC.properties, 10.0, imp)
        assert tau == MIN_CONTACT_TIME


class TestInverseInertia:
    def test_identity_orientation(self):
        mp = MassProperties(mass=1.0, inertia_diagonal=np.array([2.0, 4.0, 8.0]))
        inv = inverse_inertia_tensor(mp)
        assert np.allclose(inv, np.diag([0.5, 0.25, 0.125]))

    def test_rotated_orientation(self):
        # 90 degrees about z: x<->y principal axes swap.
        q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
        mp = MassProperties(mass=1.0, inertia_diagonal=np.array([2.0, 4.0, 8.0]),
                            inertia_orientation=q)
        inv = inverse_inertia_tensor(mp)
        assert np.allclose(np.diag(inv), [0.25, 0.5, 0.125], atol=1e-12)
