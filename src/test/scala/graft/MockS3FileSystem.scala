package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only object store: local storage under a `mocks3://` scheme whose
  * `rename` THROWS — the defining constraint of an object store taken to
  * its logical extreme (there, rename is copy+delete: O(bytes),
  * non-atomic; here it is forbidden outright so any code path that
  * silently depends on rename fails loudly in CI). Advertises
  * [[graft.sources.StorageOps.AtomicPutOverwriteCapability]]: a
  * single-object overwrite PUT (create with overwrite) IS atomic, which
  * is the primitive the versioned-publish pointer flip builds on.
  *
  * Registered per-spec via `fs.mocks3.impl`; everything else (create,
  * open, list, delete, mkdirs) delegates to the local filesystem.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      s"mocks3: rename($src, $dst) — object stores have no rename; " +
        "commit must route through a rename-free committer")

  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == graft.sources.StorageOps.AtomicPutOverwriteCapability ||
      super.hasPathCapability(path, capability)
}
