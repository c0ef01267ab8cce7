package graft.enrich

/** L7: OAuth token cache with expiry-based refresh — the reference fetches
  * a token, assumes ~50 minutes of validity, and refreshes on expiry
  * (`catalog search - vision/stage2_process_vision.py:490-499`,
  * `semantic search/stage_01_chapter_processing.py:300-391`).
  *
  * Pure state machine: the fetcher and the clock are injected, so the
  * refresh/failure semantics are unit-testable without a network. A
  * failed fetch caches nothing (the next call retries), matching the
  * reference's None-propagation.
  */
final class TokenCache(ttlMs: Long, fetch: () => Option[String],
    clock: () => Long = () => System.currentTimeMillis()) extends Serializable {

  @volatile private var cached: Option[String] = None
  @volatile private var expiresAt: Long = 0L
  @volatile private var fetches: Long = 0L

  /** The valid token, fetching/refreshing if absent or expired. */
  def get(): Option[String] = synchronized {
    if (cached.isDefined && clock() < expiresAt) cached
    else {
      fetches += 1
      cached = fetch()
      expiresAt = if (cached.isDefined) clock() + ttlMs else 0L
      cached
    }
  }

  /** Force the next get() to fetch (e.g. after a 401). */
  def invalidate(): Unit = synchronized { cached = None; expiresAt = 0L }

  /** Number of upstream fetches performed (for tests/monitoring). */
  def fetchCount: Long = fetches
}

object TokenCache {
  /** The reference's assumed validity window: 50 minutes. */
  val DefaultTtlMs: Long = 50L * 60 * 1000
}
