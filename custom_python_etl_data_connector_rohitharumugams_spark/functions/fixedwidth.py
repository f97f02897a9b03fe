"""Fixed-width record layout: the 'name:width:type,...' spec shared by the
polymorphic UDTF (plans/udfs.udtf_fixed_width_parse) and its tests.

One definition for both the analyze()-time schema derivation and the
eval()-time slicing, so a width or type drift cannot open between them.
"""

from __future__ import annotations


def parse_spec(spec: str) -> list[tuple[str, int, str]]:
    """'name:width:type,...' -> [(name, width, type), ...]."""
    out = []
    for fld in spec.split(","):
        name, width, tp = fld.split(":")
        out.append((name, int(width), tp))
    return out


def parse_fixed_width(line: str, spec: str) -> tuple:
    """Slice one fixed-width line into typed values per ``spec``.

    Values are stripped of the padding spaces the renderer added; bigint
    fields parse the stripped digits. Round-trip contract (property-tested):
    for any value that fits its width and is itself strip-stable, render
    (lpad/rpad) then parse is the identity.
    """
    out, off = [], 0
    for _name, width, tp in parse_spec(spec):
        raw = line[off : off + width].strip()
        off += width
        out.append(int(raw) if tp == "bigint" else raw)
    return tuple(out)
