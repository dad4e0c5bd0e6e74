"""package_zip / attach_package under the spark-submit --py-files
launch mode: when the package is imported FROM a zip archive,
package_zip() must return that archive instead of trying to re-zip a
directory that lives inside it (shutil.make_archive raises
NotADirectoryError there — the exact crash a literal
`spark-submit --py-files pkg.zip jobs/build_sketches.py` hit)."""
import os
import subprocess
import sys

from btl_bloomfilter_spark.session import _enclosing_zip, package_zip


def test_enclosing_zip_none_on_disk():
    # imported from the working tree: not inside an archive
    assert _enclosing_zip() is None


def test_package_zip_roundtrip_from_archive(tmp_path):
    zp = package_zip()
    assert os.path.isfile(zp) and zp.endswith(".zip")
    # import the package FROM the zip in a clean subprocess: the
    # zip-imported copy must detect its enclosing archive and return
    # it as the package zip (no re-archiving)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import btl_bloomfilter_spark.session as s; "
        "assert s.__file__.startswith(%r), s.__file__; "
        "assert s._enclosing_zip() == %r, s._enclosing_zip(); "
        "assert s.package_zip() == %r; "
        "print('OK')" % (zp, zp, zp, zp)
    )
    env = dict(os.environ, PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # not the repo: the zip is the only source
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "OK"
