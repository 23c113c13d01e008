package graft.tools

import java.nio.file.Paths

import graft.sources.WriterLease

/** Minimal cross-process test fixture: acquire the writer lease of the
  * given root, announce it on stdout, hold it for the given number of
  * milliseconds (heartbeat running), release, announce. Lets a spec
  * exercise the REAL two-process protocol — a second JVM's live lease
  * refusing this one's mutations — instead of only simulating foreign
  * lease files. Args: <rootDir> <holdMillis>.
  */
object LeaseHolderMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: LeaseHolderMain <rootDir> <holdMillis>")
    val root = Paths.get(args(0))
    val holdMs = args(1).toLong
    WriterLease.withLease(root, "cross-process holder") {
      // println flushes line-buffered through ProcessBuilder pipes
      println("HELD")
      Console.out.flush()
      Thread.sleep(holdMs)
    }
    println("RELEASED")
    Console.out.flush()
  }
}
