from .types import (
    BodyHandle,
    CollisionFilter,
    ContactImpact,
    PhysicsMaterial,
    PhysicsMotion,
    ShapeBox,
    ShapePlane,
    ShapeSphere,
    SustainedContact,
)
from .world import PhysicsWorld
from .bridge import AudioContactBridge

__all__ = [
    "BodyHandle",
    "CollisionFilter",
    "ContactImpact",
    "PhysicsMaterial",
    "PhysicsMotion",
    "ShapeBox",
    "ShapePlane",
    "ShapeSphere",
    "SustainedContact",
    "PhysicsWorld",
    "AudioContactBridge",
]
