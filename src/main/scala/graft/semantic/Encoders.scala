package graft.semantic

/** Pluggable text-encoder seam. The reference loads a sentence-transformers
  * model by name (`semantic/model.py:28-37`); offline, model names resolve
  * to deterministic local encoders behind the same
  * `encode(text) -> FLOAT[dim]` contract (ADR-0009). The resolved name and
  * dim travel into [[EmbeddingCache]] metadata, so switching models
  * truncates the cache and forces a full re-index (`semantic/cache.py:86-103`).
  */
trait TextEncoder extends Serializable {
  /** The model name as configured (FRONTMATTER_EMBEDDING_MODEL). */
  def model: String
  def dim: Int
  def encode(text: String): Array[Float]
}

object Encoders {

  /** Resolve a model name to an encoder: the family comes from the name,
    * the dimension from an optional `@dim<N>` suffix (else the family
    * default); an explicit override (used by tests) wins over both.
    * Unknown names fall back to the word-hash family — mirroring the
    * reference's "any model name" surface without the network, while
    * still keying cache invalidation on the full configured name.
    */
  def forModel(model: String, dimOverride: Option[Int] = None): TextEncoder = {
    val (base, suffixDim) = model.split("@dim", 2) match {
      case Array(b, d) if d.nonEmpty && d.forall(_.isDigit) => (b, Some(d.toInt))
      case _                                                => (model, None)
    }
    val dim = dimOverride.orElse(suffixDim).getOrElse(Embed.DefaultDim)
    if (base.startsWith("graft-weights:"))
      WeightsEncoder.load(model, base.stripPrefix("graft-weights:"))
        .getOrElse {
          System.err.println(
            s"[encoders] weights file for '$model' missing/unreadable — " +
              "falling back to the word-hash family (cache stays keyed on " +
              "the configured name, so plugging the file in later re-indexes)")
          new WordHashEncoder(model, dim)
        }
    else if (base.startsWith("graft-trigram-encoder")) new TrigramEncoder(model, dim)
    else new WordHashEncoder(model, dim)
  }
}

/** Default family: feature-hashed word unigrams + bigrams (see [[Embed]]). */
final class WordHashEncoder(val model: String, val dim: Int) extends TextEncoder {
  override def encode(text: String): Array[Float] = Embed.encode(text, dim)
}

/** Second family proving the seam end-to-end: feature-hashed character
  * trigrams — robust to tokenization-hostile text, genuinely different
  * vectors from the word-hash family at the same dim.
  */
final class TrigramEncoder(val model: String, val dim: Int) extends TextEncoder {
  override def encode(text: String): Array[Float] = Embed.encodeTrigram(text, dim)
}

/** Local-weights family — the real-model integration seam.
  *
  * `FRONTMATTER_EMBEDDING_MODEL=graft-weights:/path/to/weights.txt` loads a
  * learned linear projection from disk: the file's first line is
  * `<dimIn> <dimOut>`, followed by `dimOut` rows of `dimIn`
  * whitespace-separated floats (row-major `W`). `encode(text)` feature-hashes
  * the text into a `dimIn` vector with the word-hash family, applies `W`,
  * and L2-normalizes — i.e. tokenize → featurize → matmul → normalize, the
  * exact shape of a real embedding head. The output `dim` comes from the
  * FILE, not the name, so the cache's FLOAT[dim] schema follows the weights
  * (reference derives dim from the model the same way,
  * `semantic/model.py:28-37`, ADR-0009).
  *
  * Swapping in a real sentence-transformers model (reference default
  * ruri-v3-30m) needs only this class's surface: export the model to ONNX,
  * load it with ONNX Runtime inside `load`, and make `encode` run the
  * tokenizer + session instead of the matmul. Nothing else changes —
  * [[EmbeddingCache]] invalidation keys on the configured name, the
  * indexer and `embed()` SQL function already go through [[TextEncoder]],
  * and the FLOAT[dim] schema row follows `dim`. The weights object must
  * stay driver+executor serializable (or be rebuilt lazily per executor
  * from the broadcast file path) — here the matrix is tiny model state,
  * the same class of bounded broadcast as the IVF codebooks.
  */
final class WeightsEncoder(val model: String, w: Array[Array[Float]])
    extends TextEncoder {
  val dim: Int = w.length
  private val dimIn: Int = w(0).length

  override def encode(text: String): Array[Float] = {
    val feat = Embed.encode(text, dimIn)
    val out = new Array[Double](dim)
    var r = 0
    while (r < dim) {
      val row = w(r)
      var c = 0
      var acc = 0.0
      while (c < dimIn) { acc += row(c) * feat(c); c += 1 }
      out(r) = acc
      r += 1
    }
    var norm = 0.0
    out.foreach(x => norm += x * x)
    if (norm == 0.0) { out(0) = 1.0; norm = 1.0 }
    val inv = 1.0 / math.sqrt(norm)
    out.map(x => (x * inv).toFloat)
  }
}

object WeightsEncoder {
  /** Parse the weights file; None on any structural problem (missing file,
    * bad header, ragged rows) — the caller decides the fallback.
    */
  def load(model: String, path: String): Option[WeightsEncoder] =
    try {
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(path)).toArray(Array.empty[String])
        .map(_.trim).filter(_.nonEmpty)
      val header = lines(0).split("\\s+")
      val (dimIn, dimOut) = (header(0).toInt, header(1).toInt)
      if (dimIn <= 0 || dimOut <= 0 || lines.length != dimOut + 1) None
      else {
        val w = lines.drop(1).map(_.split("\\s+").map(_.toFloat))
        if (w.exists(_.length != dimIn)) None
        else Some(new WeightsEncoder(model, w))
      }
    } catch { case _: Exception => None }
}
