""".env-style configuration (reference spec: /root/reference/README.md:16-18,
89-93 — credentials live in KEY=VALUE .env files, loaded into the process
environment, never committed or logged).

Hand-rolled parser (no python-dotenv dependency): KEY=VALUE lines, optional
``export`` prefix, ``#`` comments, single/double quote stripping.
"""

from __future__ import annotations

import os
import re
import warnings
from pathlib import Path


def parse_env_file(path: str | Path) -> dict[str, str]:
    out: dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):]
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if val[:1] in ("'", '"') and val.find(val[0], 1) != -1:
            # quoted value: prefer the FIRST matching quote when what
            # follows it is only an inline comment (dotenv's rule —
            # otherwise TOKEN='abc' # see 'docs' would absorb the comment
            # because a quote inside the comment looks like the closer);
            # fall back to the LAST matching quote so an inner apostrophe
            # as in PASSWORD='it's-secret' still doesn't truncate the
            # credential. Quoting protects a literal '#'.
            first_close = val.find(val[0], 1)
            first_trailer = val[first_close + 1 :].strip()
            close = val.rfind(val[0])
            trailer = val[close + 1 :].strip()
            if first_trailer == "" or first_trailer.startswith("#"):
                val = val[1:first_close]
            elif trailer == "" or trailer.startswith("#"):
                val = val[1:close]
            else:
                # malformed: non-comment text after the closing quote
                # (KEY='a' 'b', KEY="x" y). Take the FIRST quoted span —
                # dotenv's behavior — and warn; keeping the quotes and
                # trailer verbatim would silently hand the API a credential
                # with quote characters embedded in it.
                warnings.warn(
                    f"malformed .env line for key {key!r}: "
                    "text after the closing quote was ignored"
                )
                val = val[1:first_close]
        else:
            # dotenv semantics: an unquoted value ends at a whitespace-led
            # '#' (inline comment). ANY whitespace counts — matching only
            # a literal space would keep a tab-led comment inside the
            # credential and every API call would 401
            m = re.search(r"\s#", val)
            if m is not None:
                val = val[: m.start()].rstrip()
            elif val.startswith("#"):
                val = ""
        if key:
            out[key] = val
    return out


def load_env(path: str | Path, override: bool = False) -> dict[str, str]:
    """Parse ``path`` and inject into ``os.environ`` (existing values win
    unless ``override``). Returns what was parsed."""
    parsed = parse_env_file(path)
    for k, v in parsed.items():
        if override or k not in os.environ:
            os.environ[k] = v
    return parsed


def redacted(env: dict[str, str]) -> dict[str, str]:
    """Loggable view: values masked (the spec forbids credential leakage)."""
    return {k: "****" for k in env}
