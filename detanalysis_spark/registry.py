"""Plugin cut/feature registry with metadata decorators and version
gating.

Reference semantics: detanalysis analyzer.py:1102-1225 (_load_func:
discover .py scripts, exec, register every function as a cut/feature
with its decorator metadata; same-or-lower version re-registration is
rejected unless overwrite) and func.py:7-39 (the @version/@authors/
@date/@description/@contact metadata decorators). git provenance
capture (analyzer.py:1167-1225) is done by shelling out to git —
no GitPython dependency.

Spark-first difference: a plugin function receives the master
DataFrame and returns a Catalyst ``Column`` (boolean for cuts, any
type for features) — the expression is registered on the Analyzer, so
plugins compose with predicate pushdown like hand-written cuts. The
script exec happens once on the driver; nothing dynamic runs per-row.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
from glob import glob
from inspect import getmembers, isfunction

from pyspark.sql import Column

__all__ = ["version", "authors", "date", "description", "contact",
           "load_plugins", "get_repo_info"]


# ----------------------------------------------------------------------
# metadata decorators (func.py:7-39)
# ----------------------------------------------------------------------
def version(par):
    def _wrapper(func):
        func.version = float(par)
        return func
    return _wrapper


def authors(par):
    def _wrapper(func):
        func.authors = str(par)
        return func
    return _wrapper


def description(par):
    def _wrapper(func):
        func.description = str(par)
        return func
    return _wrapper


def contact(par):
    def _wrapper(func):
        func.contact = str(par)
        return func
    return _wrapper


def date(par):
    def _wrapper(func):
        func.date = str(par)
        return func
    return _wrapper


# ----------------------------------------------------------------------
# git provenance (analyzer.py:1167-1225), subprocess-based
# ----------------------------------------------------------------------
def _git(repo_dir: str, *args: str) -> str | None:
    try:
        out = subprocess.run(["git", "-C", repo_dir, *args],
                             capture_output=True, text=True, timeout=10)
        return out.stdout.strip() if out.returncode == 0 else None
    except (OSError, subprocess.TimeoutExpired):
        return None


def get_repo_info(repo_dir: str | None) -> dict:
    """Capture the analysis repo's name/branch/tag/commit (with -dirty
    suffix), tolerating missing/empty/detached repos."""
    info = {"git_repo_name": None, "git_repo_branch": None,
            "git_repo_tag": None, "git_repo_commit": None}
    if repo_dir is None or _git(repo_dir, "rev-parse", "--git-dir") is None:
        return info
    top = _git(repo_dir, "rev-parse", "--show-toplevel")
    info["git_repo_name"] = os.path.basename(top) if top else None
    if _git(repo_dir, "rev-parse", "HEAD") is None:      # empty repo
        return info
    branch = _git(repo_dir, "rev-parse", "--abbrev-ref", "HEAD")
    info["git_repo_branch"] = None if branch == "HEAD" else branch
    commit = _git(repo_dir, "rev-parse", "--short", "HEAD")
    dirty = _git(repo_dir, "status", "--porcelain")
    if commit and dirty:
        commit += "-dirty"
    info["git_repo_commit"] = commit
    tag = (_git(repo_dir, "describe", "--tags", "--dirty", "--broken")
           or _git(repo_dir, "describe", "--always"))
    info["git_repo_tag"] = tag if tag else commit
    return info


# ----------------------------------------------------------------------
# discovery + registration (analyzer.py:1102-1165)
# ----------------------------------------------------------------------
def _discover(paths) -> list[str]:
    if not isinstance(paths, (list, tuple)):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(glob(os.path.join(p, "*.py")))
        elif os.path.isfile(p):
            files.append(p)
        else:
            raise ValueError(f"unknown path or file {p!r}")
    return sorted(set(files))


def load_plugins(analyzer, paths, is_cut: bool = True,
                 repo_dir: str | None = None,
                 overwrite: bool = False) -> list[str]:
    """Load cut/feature scripts and register each function.

    Each script-level function is called with the master DataFrame and
    must return a ``Column``. Version gate: a function already
    registered at the same or newer ``@version`` is skipped (unless
    ``overwrite``); an upgrade re-registers. Returns the names
    registered this call.
    """
    registered: list[str] = []
    repo_info = get_repo_info(repo_dir) if repo_dir is not None else {}
    target = analyzer._cuts if is_cut else analyzer._features

    for path in _discover(paths):
        spec = importlib.util.spec_from_file_location(
            f"detanalysis_spark._plugin_{os.path.basename(path)[:-3]}", path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)

        for func_name, func_obj in getmembers(module, isfunction):
            # only functions defined in the script itself — not helpers
            # the script imported (e.g. these decorators, F.col, ...)
            if getattr(func_obj, "__module__", None) != module.__name__:
                continue
            metadata = {k: v for k, v in vars(func_obj).items()
                        if not k.startswith("__")}
            metadata.update(repo_info)

            if not overwrite and func_name in target:
                new_v = metadata.get("version")
                old_v = target[func_name].metadata.get("version")
                if new_v is not None and old_v is not None \
                        and float(new_v) <= float(old_v):
                    continue

            col = func_obj(analyzer.df_full)
            if not isinstance(col, Column):
                raise TypeError(
                    f"plugin {func_name!r} in {path} must return a "
                    f"pyspark Column, got {type(col).__name__}")
            if is_cut:
                analyzer.register_cut(col, func_name, metadata=metadata,
                                      overwrite=True)
            else:
                analyzer.register_feature(col, func_name, metadata=metadata,
                                          overwrite=True)
            registered.append(func_name)
    return registered
