package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.sources.WriterLease

/** Shared fixture for planting crashed-foreign-writer lease debris in
  * stress specs. The plant is ATOMIC (temp file with the stale mtime,
  * then one rename onto the lease path): a concurrently-firing
  * detached fold can never observe a half-planted, fresh-looking file
  * (which would read as a LIVE foreign writer and poison
  * awaitMaintenance with a sticky refusal).
  */
object TestLeases {
  def plantStale(root: Path, token: String): Unit = {
    Files.createDirectories(root)
    val tmp = root.resolve(
      s"_lease_plant_${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, token)
    Files.setLastModifiedTime(tmp, FileTime.fromMillis(
      System.currentTimeMillis() - WriterLease.staleMs - 5000))
    Files.move(tmp, root.resolve(WriterLease.LeaseName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
