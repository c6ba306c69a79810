"""Field layer: generic 16x16-bit-limb Montgomery arithmetic for GF(q), GF(r)."""

from .element import FQ_SPEC, FR_SPEC, FieldElement, Fq, Fr
from .spec import LIMB_BITS, MASK, NLIMBS, FieldSpec, int_to_limbs, limbs_to_int
from . import mont, sqrt

__all__ = [
    "FQ_SPEC", "FR_SPEC", "FieldElement", "Fq", "Fr",
    "LIMB_BITS", "MASK", "NLIMBS", "FieldSpec", "int_to_limbs", "limbs_to_int",
    "mont", "sqrt",
]
