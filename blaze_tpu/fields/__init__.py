from .spec import (
    FieldSpec,
    FIELDS,
    BN254_FQ,
    BN254_FR,
    BLS12_381_FQ,
    BLS12_381_FR,
    BLS12_377_FQ,
    BLS12_377_FR,
    LIMB_BITS,
    LIMB_MASK,
    int_to_limbs,
    limbs_to_int,
)
from .mont import Field
from .codec import bytes_to_limbs, limbs_to_bytes

__all__ = [
    "FieldSpec",
    "Field",
    "FIELDS",
    "BN254_FQ",
    "BN254_FR",
    "BLS12_381_FQ",
    "BLS12_381_FR",
    "BLS12_377_FQ",
    "BLS12_377_FR",
    "LIMB_BITS",
    "LIMB_MASK",
    "int_to_limbs",
    "limbs_to_int",
    "bytes_to_limbs",
    "limbs_to_bytes",
]
