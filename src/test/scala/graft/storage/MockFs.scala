package graft.storage

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A `mock:` scheme filesystem backed by local disk — the standard
  * Hadoop-test trick for exercising the non-`file:` code path (scheme
  * resolution, qualified listings, no OS writer lock) without a real
  * HDFS/S3 endpoint. Registered via `fs.mock.impl`. */
class MockFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mock:///")
}
