"""Shared HTML tag-attribute parsing (frozen rule used by the robots,
page-metadata and hreflang extractors): attribute names lowercase,
double-/single-/un-quoted values accepted, later duplicates overwrite
earlier ones (dict semantics)."""

from __future__ import annotations

import re

TAG_ATTR_RE = re.compile(
    r"""([a-zA-Z-]+)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.DOTALL,
)


def parse_tag_attrs(tag: str) -> dict[str, str]:
    """One raw ``<tag ...>`` string -> {name: value}."""
    return {m.group(1).lower(): (m.group(2) or m.group(3) or m.group(4) or "")
            for m in TAG_ATTR_RE.finditer(tag)}
