"""Guard the driver entry points: dryrun_multichip on the test CPU mesh."""

import subprocess
import sys
from pathlib import Path
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).parent.parent


def test_dryrun_multichip_4():
    sys.path.insert(0, str(REPO))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)


def test_cli_module_entry():
    result = subprocess.run(
        [sys.executable, "-m", "cultionet_tpu", "version"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )
    assert result.returncode == 0
    assert result.stdout.strip()
