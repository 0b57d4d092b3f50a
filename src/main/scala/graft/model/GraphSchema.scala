package graft.model

/** Engine-side schema annotations for a document collection, replacing the
  * reference's Mongoose field flags and per-schema switch:
  *
  *   - `graphFields`  — fields projected onto the collection's graph nodes,
  *     dot-flattened (reference `graph: true`,
  *     /root/reference/src/extendDocument.coffee:368-387).
  *   - `indexFields`  — fields the reference additionally put in a Neo4j
  *     legacy index (`index: true`,
  *     /root/reference/src/extendDocument.coffee:389-407). Spark needs no
  *     secondary index for correctness; the list is retained so callers can
  *     choose to bucket/sort collections by these columns at write time.
  *   - `graphability` — per-collection kill switch; graph operators must
  *     refuse when false (/root/reference/src/mongraphMongoosePlugin.coffee:8-23).
  *   - `preRemove`    — when false, removing documents leaves their nodes in
  *     place (/root/reference/test/tests.coffee:319-344 "keyboards").
  *   - `storedDocKey` — set by [[graft.sources.GraphStore]].load ONLY: the
  *     collection DataFrame carries a storage-internal `_doc_key` column
  *     holding the canonical `"collection:id"` key (bucketed on it), which
  *     the planners join on and strip from emitted documents. An explicit
  *     flag, not column-name sniffing — a user collection that happens to
  *     have its own `_doc_key` column keeps it as ordinary data.
  */
final case class GraphSchema(
    collection: String,
    graphFields: Seq[String] = Nil,
    indexFields: Seq[String] = Nil,
    graphability: Boolean = true,
    preRemove: Boolean = true,
    storedDocKey: Boolean = false)

/** A `(collection, _id)` pointer to one document — the engine-side form of
  * the reference's `"collection:objectid"` provenance strings
  * (/root/reference/src/processtools.coffee:56-57).
  */
final case class DocRef(collection: String, id: String) {
  /** Canonical string key, identical to the `_from`/`_to` format the
    * reference stamps on relationships
    * (/root/reference/src/extendDocument.coffee:220-222). */
  def key: String = s"$collection:$id"
}

object DocRef {
  /** Inverse of [[DocRef.key]] — reference `extractCollectionAndId`
    * (/root/reference/src/processtools.coffee:56-57). */
  def fromKey(key: String): DocRef = {
    val i = key.indexOf(':')
    require(i > 0, s"malformed doc key: $key")
    DocRef(key.substring(0, i), key.substring(i + 1))
  }
}
