"""Filesystem routing for index paths (the §2.12 extension surface).

Every index directory (``out_dir``, its ``docs/`` / ``segments/`` /
``term_dict/`` children, manifests) may be a plain local path OR a
pyarrow.fs URI (``file://``, ``s3://``, ...). These helpers keep the
ORIGINAL string form — scheme included — so pyarrow readers/writers
(``pq.read_table``, ``rd.read_parquet``, ``write_parquet``) can infer the
filesystem themselves; only metadata operations (list, exists, mkdir,
delete, rename, open) are routed through the resolved
``pyarrow.fs.FileSystem``.

The SHUFFLE scratch directory is ALSO routed through these helpers: emit
tasks and merge tasks land on different nodes of a real cluster, so the
bucket files must live on storage every node can reach (default:
``out_dir/shuffle`` on the same backend as the index;
``SE_RAY_SHUFFLE_BASE`` — path or URI — overrides).

Reference parity: the reference's ``Storage`` interface
(@types/index.d.ts:1-16) is the pluggable-persistence seam; here the seam
is "any pyarrow FileSystem".
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs


def _split(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-internal path) for a local path or URI."""
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def join(path: str, *parts: str) -> str:
    """Scheme-preserving join (posix separators on every backend)."""
    return posixpath.join(path, *parts)


def listdir(path: str) -> list[str]:
    """Base names of entries directly under ``path`` ([] if absent)."""
    f, p = _split(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(posixpath.basename(i.path.rstrip("/")) for i in infos)


def isdir(path: str) -> bool:
    f, p = _split(path)
    return f.get_file_info(p).type == pafs.FileType.Directory


def exists(path: str) -> bool:
    f, p = _split(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    f, p = _split(path)
    f.create_dir(p, recursive=True)


def rmtree(path: str) -> None:
    f, p = _split(path)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def remove(path: str) -> None:
    f, p = _split(path)
    try:
        f.delete_file(p)
    except (FileNotFoundError, OSError):
        pass


def move(src: str, dst: str) -> None:
    """Rename within ONE filesystem (both args must share the scheme)."""
    f, p_src = _split(src)
    _, p_dst = _split(dst)
    f.move(p_src, p_dst)


def copy_file(src: str, dst: str) -> None:
    f_src, p_src = _split(src)
    f_dst, p_dst = _split(dst)
    if type(f_src) is type(f_dst):
        f_src.copy_file(p_src, p_dst)
    else:
        with f_src.open_input_stream(p_src) as r, f_dst.open_output_stream(
            p_dst
        ) as w:
            w.write(r.read())


def file_size(path: str) -> int:
    f, p = _split(path)
    return int(f.get_file_info(p).size or 0)


def resolve_data_paths(paths: list[str]) -> tuple[list[str], pafs.FileSystem | None]:
    """(reader_paths, filesystem) for pyarrow / Ray Data readers.

    Readers reject a LIST of URIs once a filesystem is resolved, so URI
    lists are stripped to fs-internal paths and the resolved FileSystem is
    returned for the ``filesystem=`` argument; local paths pass through
    with None."""
    if not paths or "://" not in paths[0]:
        return list(paths), None
    f, _ = _split(paths[0])
    return [_split(p)[1] for p in paths], f


def read_parquet_table(paths, **kwargs):
    """pq.read_table for a path/URI or a list of them (URI lists need the
    filesystem resolved explicitly)."""
    import pyarrow.parquet as pq

    as_list = paths if isinstance(paths, list) else [paths]
    p, f = resolve_data_paths(as_list)
    if f is None:
        return pq.read_table(paths, **kwargs)
    return pq.read_table(p if isinstance(paths, list) else p[0], filesystem=f, **kwargs)


def write_parquet_table(table, path: str, **kwargs) -> None:
    """pq.write_table to a local path or URI (explicit stream for URIs so
    every backend a FileSystem can reach works, not just the ones
    pq.write_table resolves itself)."""
    import pyarrow.parquet as pq

    if "://" not in path:
        pq.write_table(table, path, **kwargs)
        return
    f, p = _split(path)
    parent = posixpath.dirname(p)
    if parent:
        f.create_dir(parent, recursive=True)
    with f.open_output_stream(p) as w:
        pq.write_table(table, w, **kwargs)


def parquet_metadata(path: str):
    """pq.read_metadata for a local path or URI."""
    import pyarrow.parquet as pq

    if "://" not in path:
        return pq.read_metadata(path)
    f, p = _split(path)
    with f.open_input_file(p) as fh:
        return pq.read_metadata(fh)


def read_bytes(path: str) -> bytes:
    f, p = _split(path)
    with f.open_input_stream(p) as r:
        return r.read()


def write_bytes(path: str, data: bytes) -> None:
    f, p = _split(path)
    parent = posixpath.dirname(p)
    if parent:
        f.create_dir(parent, recursive=True)
    with f.open_output_stream(p) as w:
        w.write(data)
