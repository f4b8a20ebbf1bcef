"""Scratch: profile q_dedup_semantic variants at sf0.1 (not shipped)."""
import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from iceberg_matrix_spark import get_spark
from iceberg_matrix_spark.operators import similarity as S
from iceberg_matrix_spark.sources.testdata import load_table
from iceberg_matrix_spark.functions.vectors import cosine, l2_norm

spark = get_spark(app_name="prof-sem", adaptive=True)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
emb = load_table(spark, SF, "embeddings")

def unrolled_dot(a: str, b: str, dim: int = 64) -> F.Column:
    av, bv = F.col(a), F.col(b)
    s = F.lit(0.0)
    for i in range(1, dim + 1):
        s = s + F.element_at(av, i).cast("double") * F.element_at(bv, i).cast("double")
    return s

# variant B: carry norm, unrolled codegen dot in filter+projection
def banded_with_norm(df, id_col, vec_col, bands):
    from iceberg_matrix_spark.operators.scale import ensure_compute_parallelism
    rows = S._N_PLANES // bands
    mask = (1 << rows) - 1
    base = ensure_compute_parallelism(df.select(F.col(id_col), F.col(vec_col)))
    keep = [F.col(id_col), S.hyperplane_signature(vec_col).alias("__sig"),
            F.col(vec_col).alias("__v"), l2_norm(vec_col).alias("__n")]
    with_sig = base.select(*keep)
    sig = F.col("__sig")
    rot = F.shiftrightunsigned(sig, 1).bitwiseOR(F.shiftleft(sig.bitwiseAND(F.lit(1)), S._N_PLANES - 1))
    chunks = F.array(
        *[F.shiftrightunsigned(sig, i * rows).bitwiseAND(F.lit(mask)) for i in range(bands)],
        *[F.shiftrightunsigned(rot, i * rows).bitwiseAND(F.lit(mask)) for i in range(bands)],
    )
    return with_sig.select(F.col(id_col), F.col("__sig"),
                           F.posexplode(chunks).alias("band", "chunk"),
                           F.col("__v"), F.col("__n"))

def verified_pairs_b(banded, bands, threshold, id_col="vec_id"):
    rows = S._N_PLANES // bands
    mask = (1 << rows) - 1
    a, b = banded.alias("a"), banded.alias("b")
    x = F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))
    xr = F.shiftrightunsigned(x, 1).bitwiseOR(F.shiftleft(x.bitwiseAND(F.lit(1)), S._N_PLANES - 1))
    def first_collision(z):
        return F.array_position(F.array(*[
            F.shiftrightunsigned(z, j * rows).bitwiseAND(F.lit(mask)) == F.lit(0)
            for j in range(bands)]), F.lit(True))
    band = F.col("a.band")
    f1, f2 = first_collision(x), first_collision(xr)
    is_first = F.when(band < bands, band == f1 - 1).otherwise((f1 == 0) & (band - bands == f2 - 1))
    cond = (F.col("a.band") == F.col("b.band")) & (F.col("a.chunk") == F.col("b.chunk")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    score = unrolled_dot("a.__v", "b.__v") / (F.col("a.__n") * F.col("b.__n"))
    verified = F.when(is_first, score >= F.lit(threshold)).otherwise(F.lit(False))
    return (a.join(b, cond).filter(verified)
            .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"),
                    score.alias("score")))

def timeit(name, df):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best:.2f}s")
    return best

# warm
S.embedding_neardup_lsh(load_table(spark, "/root/testdata/sf0.001", "embeddings")).write.format("noop").mode("overwrite").save()

a_df = S.embedding_neardup_lsh(emb, threshold=0.4)
timeit("A current (HOF cosine inline)", a_df)

bb = banded_with_norm(emb, "vec_id", "embedding", S._BANDS)
b_df = verified_pairs_b(bb, S._BANDS, 0.4)
timeit("B carried-norm unrolled codegen", b_df)

# equality check (exact scores)
ra = {(r.id1, r.id2): r.score for r in a_df.collect()}
rb = {(r.id1, r.id2): r.score for r in b_df.collect()}
assert set(ra) == set(rb), (len(ra), len(rb), set(ra) ^ set(rb))
diff = [k for k in ra if ra[k] != rb[k]]
print("pairs:", len(ra), "score mismatches:", len(diff), diff[:5])
spark.stop()
