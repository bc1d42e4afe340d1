"""Dockerfile lint gate — the in-env substitute for building the images.

The reference CI built its container recipes and committed the output
WAVs (/root/reference/tests/docker/Makefile:1-4); this environment has
no docker binary, so the recipes can only rot silently.  These tests run
scripts/lint_dockerfile.py (a hadolint-style structural checker) over
every recipe so that rot — a renamed console script, a COPY source that
no longer exists, a new stage referenced before definition — fails CI
instead of failing the first real build.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINTER = os.path.join(REPO, "scripts", "lint_dockerfile.py")

RECIPES = [
    # (dockerfile, build context)
    ("Dockerfile", REPO),
    ("Dockerfile.debian", REPO),
    # the .deb test image builds with tests/docker as its context
    (os.path.join("tests", "docker", "Dockerfile.debian.test_bookworm"),
     os.path.join(REPO, "tests", "docker")),
]


@pytest.mark.parametrize("dockerfile,context", RECIPES,
                         ids=[r[0] for r in RECIPES])
def test_dockerfile_lints_clean(dockerfile, context):
    proc = subprocess.run(
        [sys.executable, LINTER, os.path.join(REPO, dockerfile),
         "--context", context],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, (
        f"{dockerfile} has lint findings:\n{proc.stdout}{proc.stderr}"
    )


def test_linter_catches_rot(tmp_path):
    """The gate itself must fail on the rot classes it claims to catch."""
    bad = tmp_path / "Dockerfile"
    bad.write_text(
        "FROM python:3.12-slim AS builder\n"
        "COPY does_not_exist.txt /app/\n"          # DF007 missing source
        "COPY --from=nosuchstage /x /x\n"           # DF005 unknown stage
        "RUN apt-get install --yes curl\n"          # DF008 + DF009
        "ENTRYPOINT [\"renamed-binary\"]\n"
    )
    # give the context a pyproject so the entrypoint check is armed
    (tmp_path / "pyproject.toml").write_text(
        "[project.scripts]\nreal-binary = \"pkg:main\"\n"
    )
    proc = subprocess.run(
        [sys.executable, LINTER, str(bad), "--context", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    for code in ("DF005", "DF007", "DF008", "DF009", "DF013"):
        assert code in proc.stdout, f"{code} not reported:\n{proc.stdout}"


def test_linter_parses_continuations_and_mounts(tmp_path):
    """Multi-line RUNs with --mount flags (used by Dockerfile.debian)
    must parse as ONE instruction with update+install seen together."""
    df = tmp_path / "Dockerfile"
    df.write_text(
        "FROM debian:bookworm\n"
        "RUN --mount=type=cache,target=/var/cache/apt \\\n"
        "    apt-get update && \\\n"
        "    # a comment inside the continuation\n"
        "    apt-get install --yes --no-install-recommends python3\n"
    )
    proc = subprocess.run(
        [sys.executable, LINTER, str(df), "--context", str(tmp_path)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout
