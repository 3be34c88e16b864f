package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Access-control / policy predicates (SURVEY §2.12; reference
  * components/Sidebar.tsx:253-264, app/(contents)/admin/page.tsx:51-97,
  * lib/firebase/getUploadPolicy.ts:13-21).
  *
  * All pure Column expressions. Time-dependent logic takes an explicit
  * `asOf` timestamp instead of now() — deterministic under retries and
  * oracle-checkable (the reference's implicit "today" is a hidden
  * parameter; here it is explicit).
  */
object Policy {

  /** Tier lattice free(0) < basic(1) < premium(2) < admin(3)
    * (reference tierRank, Sidebar.tsx:261-263). */
  def tierRank(tier: Column): Column =
    when(tier === "free", 0).when(tier === "basic", 1)
      .when(tier === "premium", 2).when(tier === "admin", 3)
      .otherwise(0)

  /** canUse = rank(user) >= rank(required) (Sidebar.tsx:264). */
  def canUse(userTier: Column, requiredTier: Column): Column =
    tierRank(userTier) >= tierRank(requiredTier)

  /** Required tier with legacy fallback: explicit tier map value, else
    * `basic` if the slug was in the old paid list, else `free`
    * (Sidebar.tsx:253-254). `mapped` may be null. */
  def requiredTier(mapped: Column, inPaidList: Column): Column =
    coalesce(mapped, when(inPaidList, "basic").otherwise("free"))

  /** Upload quota per role (getUploadPolicy.ts:13-21): free=1, admin=100,
    * paid (basic/premium)=10. */
  def uploadQuota(role: Column): Column =
    when(role === "free", 1).when(role === "admin", 100).otherwise(10)

  /** KST midnight of an instant (F17; reference admin/page.tsx:51-56). */
  def kstDay(asOfUtc: Column): Column =
    to_date(from_utc_timestamp(asOfUtc, "Asia/Seoul"))

  /** Remaining subscription days, inclusive — same-day expiry counts as
    * 1 (F17; reference admin/page.tsx:58-97). */
  def remainingDays(endDate: Column, asOfUtc: Column): Column =
    datediff(endDate, kstDay(asOfUtc)) + 1

  /** Expired predicate: end date strictly before the KST day of asOf. */
  def isExpired(endDate: Column, asOfUtc: Column): Column =
    endDate < kstDay(asOfUtc)

  /** Role → derived subscription window: basic/premium get a 30-day
    * period from `startDate`; others none (reference
    * deriveSubscriptionByRole, admin/page.tsx). */
  def derivedEnd(role: Column, startDate: Column): Column =
    when(role === "basic" || role === "premium", date_add(startDate, 30))
      .otherwise(lit(null).cast("date"))

  /** Bulk end-date application clamped to be ≥ start
    * (clampEndAfterStart, admin/page.tsx:58-61). */
  def clampEndAfterStart(end: Column, start: Column): Column =
    when(end < start, start).otherwise(end)
}
