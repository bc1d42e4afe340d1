"""Debian packaging smoke test (reference surface: debian/ +
scripts/build-debian.sh built installable .debs)."""

import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.skipif(
    shutil.which("dpkg-deb") is None, reason="dpkg-deb not available"
)
def test_build_debian_package(tmp_path):
    out = tmp_path / "dist"
    subprocess.run(
        ["bash", str(REPO / "scripts" / "build-debian.sh"),
         "--no-deps", "--out", str(out)],
        check=True,
        capture_output=True,
        cwd=REPO,
        timeout=600,
    )
    debs = list(out.glob("larynx-tpu_*.deb"))
    assert len(debs) == 1
    listing = subprocess.run(
        ["dpkg", "-c", str(debs[0])], capture_output=True, text=True,
        check=True,
    ).stdout
    assert "./usr/bin/larynx-tpu" in listing
    assert "./usr/bin/larynx-tpu-server" in listing
    assert "larynx_tpu/server/swagger.yaml" in listing
    info = subprocess.run(
        ["dpkg", "-I", str(debs[0])], capture_output=True, text=True,
        check=True,
    ).stdout
    assert "Package: larynx-tpu" in info
