"""Plugin registry: discovery, metadata capture, version gating, git
provenance. Demo scripts are written to tmp_path in the reference's
cut-script shape (re-authored)."""

import subprocess

import pytest
from pyspark.sql import functions as F

from detanalysis_spark.analyzer import Analyzer
from detanalysis_spark.registry import get_repo_info, load_plugins

CUT_SCRIPT_V1 = '''
from pyspark.sql import functions as F
from detanalysis_spark.registry import version, authors, description

@version(1.0)
@authors("Test Author")
@description("events above threshold")
def cut_high_value(df):
    return F.col("value") > 100.0

@version(2.0)
def cut_click(df):
    return F.col("event_type") == "click"
'''

CUT_SCRIPT_V1_AGAIN = '''
from pyspark.sql import functions as F
from detanalysis_spark.registry import version

@version(1.0)
def cut_high_value(df):
    return F.col("value") > 999.0      # must NOT replace v1.0
'''

CUT_SCRIPT_V2 = '''
from pyspark.sql import functions as F
from detanalysis_spark.registry import version

@version(1.5)
def cut_high_value(df):
    return F.col("value") > 200.0      # upgrade
'''

FEATURE_SCRIPT = '''
from pyspark.sql import functions as F
from detanalysis_spark.registry import version, date

@version(1.0)
@date("2026-01-01")
def value_squared(df):
    return F.col("value") * F.col("value")
'''

BAD_SCRIPT = '''
def not_a_column(df):
    return 42
'''


@pytest.fixture()
def ana(spark, sf_dir):
    from tests.conftest import load
    return Analyzer(load(spark, sf_dir, "events"))


def test_load_and_metadata(ana, tmp_path):
    p = tmp_path / "cuts_v1.py"
    p.write_text(CUT_SCRIPT_V1)
    got = load_plugins(ana, str(tmp_path), is_cut=True)
    assert sorted(got) == ["cut_click", "cut_high_value"]
    info = ana._cuts["cut_high_value"]
    assert info.metadata["version"] == 1.0
    assert info.metadata["authors"] == "Test Author"
    n = ana._subset_df(ana.df, "cut_high_value").count()
    assert n == ana.df.filter(F.col("value") > 100.0).count()


def test_version_gate_rejects_same_version(ana, tmp_path):
    (tmp_path / "a.py").write_text(CUT_SCRIPT_V1)
    load_plugins(ana, str(tmp_path / "a.py"))
    (tmp_path / "b.py").write_text(CUT_SCRIPT_V1_AGAIN)
    got = load_plugins(ana, str(tmp_path / "b.py"))
    assert got == []                                # same version → skipped
    n = ana._subset_df(ana.df, "cut_high_value").count()
    assert n == ana.df.filter(F.col("value") > 100.0).count()

    (tmp_path / "c.py").write_text(CUT_SCRIPT_V2)
    got = load_plugins(ana, str(tmp_path / "c.py"))
    assert got == ["cut_high_value"]                # upgrade accepted
    assert ana._cuts["cut_high_value"].metadata["version"] == 1.5

    # overwrite bypasses the gate
    got = load_plugins(ana, str(tmp_path / "b.py"), overwrite=True)
    assert got == ["cut_high_value"]
    assert ana._cuts["cut_high_value"].metadata["version"] == 1.0


def test_feature_plugins(ana, tmp_path):
    (tmp_path / "feat.py").write_text(FEATURE_SCRIPT)
    got = load_plugins(ana, str(tmp_path), is_cut=False)
    assert got == ["value_squared"]
    assert ana._features["value_squared"].metadata["date"] == "2026-01-01"
    r = ana.df_full.select("value", "value_squared").first()
    assert r.value_squared == pytest.approx(r.value ** 2)


def test_non_column_plugin_rejected(ana, tmp_path):
    (tmp_path / "bad.py").write_text(BAD_SCRIPT)
    with pytest.raises(TypeError, match="must return a pyspark Column"):
        load_plugins(ana, str(tmp_path))


def test_unknown_path_raises(ana):
    with pytest.raises(ValueError, match="unknown path"):
        load_plugins(ana, "/nonexistent/dir")


def test_repo_info_capture(tmp_path):
    assert get_repo_info(None)["git_repo_commit"] is None
    assert get_repo_info(str(tmp_path))["git_repo_commit"] is None  # not a repo

    subprocess.run(["git", "init", "-q", str(tmp_path)], check=True)
    info = get_repo_info(str(tmp_path))                 # empty repo
    assert info["git_repo_name"] == tmp_path.name
    assert info["git_repo_commit"] is None

    (tmp_path / "f.txt").write_text("x")
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}
    subprocess.run(["git", "-C", str(tmp_path), "add", "."], check=True)
    subprocess.run(["git", "-C", str(tmp_path), "commit", "-qm", "x"],
                   check=True, env={**__import__("os").environ, **env})
    info = get_repo_info(str(tmp_path))
    assert info["git_repo_commit"] is not None
    assert "-dirty" not in info["git_repo_commit"]

    (tmp_path / "f.txt").write_text("y")                # dirty now
    info = get_repo_info(str(tmp_path))
    assert info["git_repo_commit"].endswith("-dirty")
