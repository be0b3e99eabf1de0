"""Host/system utilities: dirs, symlinks, resource logging.

Parity surface for the reference's falcon_kit/util/system.py:14-42
(make_dirs / symlinking with relative-path fixup) and util/io.py:32-35
(maxrss logging at task milestones).  Lustre striping
(util/system.py:45-54) has no analog here -- there is no shared-FS data
plane -- and is intentionally omitted.
"""
import contextlib
import logging
import os

LOG = logging.getLogger(__name__)


def make_dirs(d):
    """mkdir -p (reference: util/system.py make_dirs)."""
    if d and not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)


@contextlib.contextmanager
def cd(newdir):
    """chdir context manager (reference: util/system.py cd)."""
    prevdir = os.getcwd()
    LOG.debug("CD: %r <- %r", newdir, prevdir)
    os.chdir(os.path.expanduser(newdir))
    try:
        yield
    finally:
        LOG.debug("CD: %r -> %r", newdir, prevdir)
        os.chdir(prevdir)


def symlink(actual, symbolic=None, force=True):
    """Symlink `actual` at `symbolic` (basename default), relative when
    they share a tree (reference: util/system.py:14-42 symlink)."""
    symbolic = symbolic or os.path.basename(actual)
    if os.path.abspath(actual) == os.path.abspath(symbolic):
        LOG.warning("Cannot symlink %r as %r, itself.", actual, symbolic)
        return
    rel = os.path.relpath(actual, os.path.dirname(symbolic) or ".")
    if force and (os.path.lexists(symbolic)):
        os.unlink(symbolic)
    os.symlink(rel, symbolic)


def maxrss_mb():
    """Peak RSS of this process in MB (0.0 if resource is unavailable)."""
    try:
        import resource
    except ImportError:  # non-posix
        return 0.0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KB on Linux but bytes on macOS
    import sys
    if sys.platform == "darwin":
        return rss / (1024.0 * 1024.0)
    return rss / 1024.0


def log_resources(label):
    """Log peak RSS at a phase milestone (reference: util/io.py:32-35
    system_resources logging called at ovlp_filter stage boundaries)."""
    LOG.info("[%s] maxrss: %.1f MB", label, maxrss_mb())
