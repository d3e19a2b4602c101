"""Compute kernels: SoA scalar math, kinematics, dynamics, contacts, RNG."""
