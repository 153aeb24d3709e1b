"""Regenerate REGISTRY.md from sparkcollector/queries.py.

Entry order is registration order; the description is the banner
comment block immediately above each ``@register`` call, flattened to
one line and truncated.  Run after adding registry entries::

    python scripts/gen_registry.py > REGISTRY.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

SRC = "sparkcollector/queries.py"
MAXLEN = 160


def banner_descriptions(text: str) -> dict[str, str]:
    """Map entry name -> flattened banner comment above its @register."""
    out: dict[str, str] = {}
    lines = text.splitlines()
    for i, line in enumerate(lines):
        m = re.match(r'@register\(\s*$', line) or re.match(
            r'@register\("([a-z0-9_]+)"', line
        )
        if not re.match(r"@register\(", line):
            continue
        # entry name: same line or the next non-empty line
        nm = re.search(r'"([a-z0-9_]+)"', line)
        j = i + 1
        while nm is None and j < len(lines):
            nm = re.search(r'"([a-z0-9_]+)"', lines[j])
            j += 1
        if nm is None:
            continue
        name = nm.group(1)
        # walk up past decorators/defs to the comment block
        k = i - 1
        block: list[str] = []
        while k >= 0:
            s = lines[k].strip()
            if s.startswith("#"):
                stripped = s.lstrip("#").strip()
                if not re.fullmatch(r"-{5,}", stripped):
                    block.append(stripped)
                k -= 1
            elif s == "":
                if block:
                    break
                k -= 1
            else:
                break
        block.reverse()
        desc = " ".join(x for x in block if x)
        desc = re.sub(r"^\d+[a-z]?\.\s*", "", desc)
        out[name] = desc
    return out


def main() -> None:
    from sparkcollector.queries import REGISTRY

    text = open(SRC).read()
    descs = banner_descriptions(text)
    n = len(REGISTRY)
    n_oracle = sum(1 for _, (_, sql) in REGISTRY.items() if sql is not None)
    print("# REGISTRY — driver-facing query/operator index")
    print()
    print("Generated from `sparkcollector.queries.REGISTRY`; descriptions from the")
    print("banner comments above each registration.")
    print()
    print(
        f"**{n} entries; {n_oracle} with a DuckDB oracle** "
        "(rows-only = genuinely iterative, no SQL oracle)."
    )
    print()
    print("| # | entry | oracle | description |")
    print("|---|---|---|---|")
    for idx, (name, (_, sql)) in enumerate(REGISTRY.items(), 1):
        d = descs.get(name, "")
        if len(d) > MAXLEN:
            d = d[:MAXLEN] + "..."
        d = d.replace("|", "\\|")
        print(f"| {idx} | `{name}` | {'yes' if sql else 'rows-only'} | {d} |")


if __name__ == "__main__":
    main()
