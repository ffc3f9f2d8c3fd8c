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
    if (base.startsWith("graft-trigram-encoder")) new TrigramEncoder(model, dim)
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
