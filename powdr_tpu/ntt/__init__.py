from .ntt import (
    bitrev,
    bitrev_indices,
    coset_lde,
    eval_poly_at_ext,
    evaluate_from_rev,
    interpolate_rev,
    intt,
    intt_rev_to_natural,
    ntt,
    ntt_natural_to_rev,
)

__all__ = [
    "bitrev",
    "bitrev_indices",
    "coset_lde",
    "eval_poly_at_ext",
    "evaluate_from_rev",
    "interpolate_rev",
    "intt",
    "intt_rev_to_natural",
    "ntt",
    "ntt_natural_to_rev",
]
