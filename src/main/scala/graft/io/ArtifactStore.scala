package graft.io

/** Scratch [[ModelStore]] roots for corpus-keyed derived artifacts
  * (ANN indexes, cluster decisions): one store per (artifact family,
  * canonical corpus dir), keyed by the FULL canonical path's MD5 so
  * two corpora sharing a basename can never serve each other's
  * artifacts. Staleness is the CALLER's contract: stamp commits with
  * a content fingerprint + hyperparameter signature and rebuild on
  * mismatch (the AnnIndex/NearDup pattern). These live under /tmp by
  * design — self-contained demo/benchmark queries; a real deployment
  * roots its artifact stores on durable storage. */
object ArtifactStore {
  def forDir(family: String, dir: String): ModelStore = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getCanonicalPath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    new ModelStore(s"/tmp/graft-$family/$key")
  }
}
