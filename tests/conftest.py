from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from sparkcodec.session import get_spark

    s = get_spark(cores=8, app_name="sparkcodec-tests", driver_memory="16g")
    yield s


@pytest.fixture(scope="session")
def code_files_small():
    """5k-row deterministic code_files table (arrow), shared per session."""
    from sparkcodec.tables import code_files_arrow

    return code_files_arrow(5000, seed=42)
