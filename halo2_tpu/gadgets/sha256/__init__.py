"""SHA-256 gadget (SURVEY.md §2.33) — spread-table core.

Round 1 ships the host primitives (sha256 reference implementation), the
spread/interleave utilities, and the (tag, dense, spread) lookup table chip
that underpins the Table16 design (halo2_gadgets/src/sha256/table16/
spread_table.rs).  The message-schedule and compression subregions land next
round (PARITY.md §2.33).
"""

from .primitives import sha256_compress, sha256_digest
from .spread_table import SpreadTableChip, SpreadTableConfig, SpreadWord, get_tag
from .util import even_bits, interleave_u16, odd_bits, spread_u16

__all__ = [
    "sha256_compress",
    "sha256_digest",
    "SpreadTableChip",
    "SpreadTableConfig",
    "SpreadWord",
    "get_tag",
    "spread_u16",
    "interleave_u16",
    "even_bits",
    "odd_bits",
]
