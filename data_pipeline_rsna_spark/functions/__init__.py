from .scalars import (  # noqa: F401
    content_key,
    int_of_float,
    py_round,
    seeded_uniform,
    strip_suffix,
    synth_variant_id,
)
