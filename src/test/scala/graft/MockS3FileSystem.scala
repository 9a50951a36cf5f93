package graft

/** Mock object store for the store-layout contract tests: a
  * RawLocalFileSystem that reports scheme `s3mock` — NOT on
  * `StoreLayout`'s atomic-rename allowlist, so every manifest commit
  * against it runs the classic-S3A refusal path, while reads/writes/
  * renames behave like a real filesystem underneath (letting the
  * single-writer opt-in cookbook run a store lifecycle end-to-end).
  * Registered per test via `fs.s3mock.impl` in the Hadoop conf;
  * instantiated reflectively by Hadoop, hence the no-arg class.
  */
class MockS3FileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3mock"
  override def getUri: java.net.URI = java.net.URI.create("s3mock:///")
}
