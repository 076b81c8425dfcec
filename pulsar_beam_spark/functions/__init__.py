from .vector import cosine_sim, dot, l2_norm  # noqa: F401
from .texthash import tokens, shingles, poly_fingerprint, exploded_nonnull  # noqa: F401
