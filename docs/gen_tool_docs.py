"""Render per-subcommand usage docs (docs/tools/<sub>.md) from the live
argparse tree plus the hand-written preludes (docs/preludes/<sub>.md) —
the same prelude + generated-option-reference structure the reference
publishes under docs/tools (reference: docs/tools/cluster.md,
admin-generated from its clap definitions).

Run: python docs/gen_tool_docs.py [--check]
--check exits 1 if the committed files are stale instead of rewriting.
"""

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SUBCOMMANDS = ["cluster", "analyse", "process", "cluster-validate"]


def _render_action(a: argparse.Action) -> str:
    flags = ", ".join(f"**{o}**" for o in a.option_strings)
    meta = ""
    if a.nargs != 0 and not isinstance(
        a, (argparse._StoreTrueAction, argparse._VersionAction)
    ):
        m = a.metavar or (a.dest.upper() if a.dest else "")
        if m:
            meta = f" *{m}*"
            if a.nargs in ("+", "*"):
                meta += " .."
    text = (a.help or "").replace("\n", " ")
    return f"{flags}{meta}\n\n  {text}\n"


def render(sub: str) -> str:
    from galah_tpu.cli.main import build_parser

    parser = build_parser()
    subparsers = next(
        x for x in parser._actions
        if isinstance(x, argparse._SubParsersAction)
    )
    sp = subparsers.choices[sub]

    out = [f"# galah-tpu {sub}\n"]
    prelude = os.path.join(HERE, "preludes", f"{sub}.md")
    with open(prelude) as f:
        out.append(f.read().rstrip() + "\n")
    for group in sp._action_groups:
        actions = [
            a for a in group._group_actions
            if a.option_strings and not isinstance(a, argparse._HelpAction)
        ]
        if not actions:
            continue
        out.append(f"\n## {group.title}\n")
        out.append("\n<!-- -->\n".join(_render_action(a) for a in actions))
    return "\n".join(out)


def main() -> int:
    check = "--check" in sys.argv
    stale = []
    for sub in SUBCOMMANDS:
        path = os.path.join(HERE, "tools", f"{sub}.md")
        text = render(sub)
        current = (
            open(path).read() if os.path.exists(path) else None
        )
        if current != text:
            if check:
                stale.append(path)
            else:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "w") as f:
                    f.write(text)
                print(f"wrote {path}")
    if stale:
        print("STALE (rerun python docs/gen_tool_docs.py):")
        for p in stale:
            print(f"  {p}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
