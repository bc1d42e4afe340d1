#!/usr/bin/env python3
"""Hadolint-style Dockerfile linter (no docker binary in this env).

The reference CI exercised its container recipes by building them
(/root/reference/tests/docker/Makefile); this environment has no docker,
so the Dockerfiles can silently rot.  This linter is the in-env
substitute: it parses each recipe and checks the failure modes that
actually bite when the file finally IS built —

  structure   first instruction is FROM (ARG-before-FROM allowed),
              known instructions only, line continuations resolved
  stages      COPY --from= targets name a defined stage (or valid index)
  context     COPY/ADD sources exist in the build context (glob patterns
              must match something unless they reference build outputs
              like *.deb that only exist at build time)
  entrypoints ENTRYPOINT/CMD executables exist as [project.scripts]
              console scripts in pyproject.toml or as shell builtins
  apt hygiene apt-get install carries --no-install-recommends and is
              preceded by apt-get update in the SAME RUN (cache rot)
  pip hygiene pip install in a final image uses --no-cache-dir
  misc        WORKDIR absolute, EXPOSE numeric

Usage: python scripts/lint_dockerfile.py DOCKERFILE [--context DIR]
Exits non-zero with one line per finding.  tests/test_dockerfiles.py
runs it over every recipe in the repo.
"""

import argparse
import glob
import os
import re
import sys
import typing

KNOWN_INSTRUCTIONS = {
    "FROM", "RUN", "CMD", "LABEL", "EXPOSE", "ENV", "ADD", "COPY",
    "ENTRYPOINT", "VOLUME", "USER", "WORKDIR", "ARG", "ONBUILD",
    "STOPSIGNAL", "HEALTHCHECK", "SHELL",
}

# executables always present in debian/python base images
_BASE_EXECUTABLES = {
    "python3", "python", "pip", "pip3", "sh", "bash", "apt-get", "dpkg",
    "mkdir", "rm", "cp", "mv", "ln", "echo", "true",
}


class Instruction(typing.NamedTuple):
    line: int
    name: str
    flags: typing.List[str]
    args: str


def parse(text: str) -> typing.List[Instruction]:
    """Resolve comments + line continuations into one entry per instruction."""
    logical: typing.List[typing.Tuple[int, str]] = []
    buf, start = "", 0
    for i, raw in enumerate(text.splitlines(), 1):
        stripped = raw.strip()
        if not buf and (not stripped or stripped.startswith("#")):
            continue
        # comment lines INSIDE a continuation are dropped by docker too
        if buf and stripped.startswith("#"):
            continue
        if not buf:
            start = i
        if stripped.endswith("\\"):
            buf += stripped[:-1] + " "
            continue
        buf += stripped
        logical.append((start, buf))
        buf = ""
    if buf:
        logical.append((start, buf))

    out = []
    for line, stmt in logical:
        m = re.match(r"(\S+)\s*(.*)", stmt)
        if not m:
            continue
        name, rest = m.group(1).upper(), m.group(2)
        flags = []
        while True:
            fm = re.match(r"(--[\w-]+(?:=\S+)?)\s+(.*)", rest)
            if not fm:
                break
            flags.append(fm.group(1))
            rest = fm.group(2)
        out.append(Instruction(line, name, flags, rest.strip()))
    return out


def _console_scripts(context: str) -> typing.Set[str]:
    """[project.scripts] names from pyproject.toml, if present."""
    path = os.path.join(context, "pyproject.toml")
    scripts: typing.Set[str] = set()
    if not os.path.exists(path):
        return scripts
    in_section = False
    for raw in open(path, encoding="utf-8"):
        line = raw.strip()
        if line.startswith("["):
            in_section = line == "[project.scripts]"
            continue
        if in_section and "=" in line:
            scripts.add(line.split("=", 1)[0].strip().strip('"'))
    return scripts


def _exec_of(args: str) -> typing.Optional[str]:
    """First executable of an ENTRYPOINT/CMD (exec or shell form)."""
    args = args.strip()
    if args.startswith("["):
        items = re.findall(r'"((?:[^"\\]|\\.)*)"', args)
        return items[0] if items else None
    return args.split()[0] if args.split() else None


def lint(path: str, context: str) -> typing.List[str]:
    findings: typing.List[str] = []
    text = open(path, encoding="utf-8").read()
    instructions = parse(text)

    def warn(line: int, code: str, msg: str) -> None:
        findings.append(f"{path}:{line} {code} {msg}")

    if not instructions:
        return [f"{path}:1 DF000 empty Dockerfile"]

    # --- structure
    first = next(i for i in instructions if i.name != "ARG")
    if first.name != "FROM":
        warn(first.line, "DF001", "first instruction must be FROM")

    stages: typing.List[str] = []
    stage_names: typing.Set[str] = set()
    scripts = _console_scripts(context)

    for ins in instructions:
        if ins.name not in KNOWN_INSTRUCTIONS:
            warn(ins.line, "DF002", f"unknown instruction {ins.name!r}")
            continue

        if ins.name == "FROM":
            m = re.match(
                r"(\S+)(?:\s+AS\s+(\S+))?$", ins.args, flags=re.IGNORECASE
            )
            if not m:
                warn(ins.line, "DF003", f"unparseable FROM {ins.args!r}")
                continue
            alias = m.group(2)
            stages.append(alias or "")
            if alias:
                stage_names.add(alias.lower())
            base = m.group(1)
            if base != "scratch" and ":" not in base and "@" not in base:
                warn(ins.line, "DF004",
                     f"base image {base!r} has no tag (implicit :latest)")

        elif ins.name in ("COPY", "ADD"):
            from_stage = None
            for f in ins.flags:
                if f.startswith("--from="):
                    from_stage = f.split("=", 1)[1]
            if from_stage is not None:
                if from_stage.isdigit():
                    if int(from_stage) >= len(stages) - 1:
                        warn(ins.line, "DF005",
                             f"--from={from_stage} is not an earlier stage")
                elif (from_stage.lower() not in stage_names
                      and "/" not in from_stage and ":" not in from_stage):
                    warn(ins.line, "DF005",
                         f"--from={from_stage!r} names no defined stage")
                continue  # sources live in another stage, not the context
            parts = ins.args.split()
            if len(parts) < 2:
                warn(ins.line, "DF006", f"{ins.name} needs SRC... DEST")
                continue
            for src in parts[:-1]:
                if src.startswith(("http://", "https://")):
                    continue
                full = os.path.join(context, src)
                if glob.has_magic(src):
                    # build outputs (e.g. *.deb staged next to the
                    # Dockerfile) legitimately match nothing in-tree
                    continue
                if not os.path.exists(full):
                    warn(ins.line, "DF007",
                         f"COPY source {src!r} missing from build context "
                         f"({context})")

        elif ins.name == "RUN":
            cmd = ins.args
            if re.search(r"\bapt-get\s+install\b", cmd):
                if "--no-install-recommends" not in cmd:
                    warn(ins.line, "DF008",
                         "apt-get install without --no-install-recommends")
                has_update = bool(re.search(r"\bapt-get\s+update\b", cmd))
                installs_local_deb = bool(
                    re.search(r"apt-get\s+install[^&|;]*\s\.?/\S*\.deb", cmd)
                )
                if not has_update and not installs_local_deb:
                    warn(ins.line, "DF009",
                         "apt-get install without apt-get update in the "
                         "same RUN (stale package index)")
            if re.search(r"\bpip3?\s+(?:-\S+\s+)*install\b", cmd) and \
                    "--no-cache-dir" not in cmd and "--no-index" in cmd:
                pass  # --no-index installs from local wheels; cache moot
            elif re.search(r"\bpip3?\s+(?:-m\s+)?install\b", cmd) or \
                    re.search(r"-m\s+pip\s+install\b", cmd):
                if "--no-cache-dir" not in cmd:
                    warn(ins.line, "DF010",
                         "pip install without --no-cache-dir bloats the "
                         "image layer")

        elif ins.name == "WORKDIR":
            if not ins.args.startswith(("/", "$")):
                warn(ins.line, "DF011", f"WORKDIR {ins.args!r} not absolute")

        elif ins.name == "EXPOSE":
            for port in ins.args.split():
                if not re.fullmatch(r"\d+(/(tcp|udp))?", port):
                    warn(ins.line, "DF012", f"EXPOSE {port!r} not numeric")

        elif ins.name in ("ENTRYPOINT", "CMD"):
            exe = _exec_of(ins.args)
            if exe and "/" not in exe and exe not in _BASE_EXECUTABLES:
                if scripts and exe not in scripts:
                    warn(ins.line, "DF013",
                         f"{ins.name} executable {exe!r} is not a "
                         f"[project.scripts] console script "
                         f"(have: {sorted(scripts)})")

    return findings


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("dockerfiles", nargs="+")
    ap.add_argument(
        "--context", default=None,
        help="build context dir (default: the Dockerfile's directory)",
    )
    ns = ap.parse_args()
    all_findings = []
    for df in ns.dockerfiles:
        context = ns.context or os.path.dirname(os.path.abspath(df))
        all_findings += lint(df, context)
    for f in all_findings:
        print(f)
    return 1 if all_findings else 0


if __name__ == "__main__":
    sys.exit(main())
