"""Reusable column expressions: the engine's scalar-function layer.

The reference's scalar surface is thin (SURVEY.md §2.8 — wire codecs,
id hashing, checksums, random generators); Spark's built-in `F.*` library
is adopted wholesale, and these modules add the engine-specific column
builders shared across operators: portable hashing/checksums, quantized
vector arithmetic, text tokenization.
"""

from .hashing import checksum_column, content_fingerprint, id_hash  # noqa: F401
from .text import n_tokens  # noqa: F401
from .vectors import dot, quantize  # noqa: F401
