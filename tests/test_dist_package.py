"""The --py-files artifact must track the package: a module added without
re-running jobs/package_pyfiles.py would import fine locally and crash only
on a real cluster — fail here instead. The zip is an untracked build
artifact, so its absence is fine; staleness is not."""

import pathlib
import zipfile

import pytest


def test_dist_zip_contains_every_module():
    repo = pathlib.Path(__file__).resolve().parent.parent
    zip_path = repo / "dist" / "rio_spark.zip"
    if not zip_path.exists():
        pytest.skip("dist artifact not built (run jobs/package_pyfiles.py)")
    z = zipfile.ZipFile(zip_path)
    zipped = {n for n in z.namelist() if n.endswith(".py")}
    current = {
        str(p.relative_to(repo))
        for p in (repo / "rio_spark").rglob("*.py")
        if "__pycache__" not in p.parts
    }
    missing = sorted(current - zipped)
    assert not missing, (
        f"modules missing from dist/rio_spark.zip: {missing} — "
        "run `python jobs/package_pyfiles.py`"
    )
