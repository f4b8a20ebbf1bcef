import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from iceberg_matrix_spark import get_spark
from iceberg_matrix_spark.operators import similarity as S
from iceberg_matrix_spark.sources.testdata import load_table
from iceberg_matrix_spark.functions.vectors import cosine, l2_norm, dot

spark = get_spark(app_name="prof-sem2", adaptive=True)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
emb = load_table(spark, SF, "embeddings")

def banded_with_norm(df, id_col, vec_col, bands):
    from iceberg_matrix_spark.operators.scale import ensure_compute_parallelism
    rows = S._N_PLANES // bands
    mask = (1 << rows) - 1
    base = ensure_compute_parallelism(df.select(F.col(id_col), F.col(vec_col)))
    with_sig = base.select(F.col(id_col), S.hyperplane_signature(vec_col).alias("__sig"),
                           F.col(vec_col).alias("__v"), l2_norm(vec_col).alias("__n"))
    sig = F.col("__sig")
    rot = F.shiftrightunsigned(sig, 1).bitwiseOR(F.shiftleft(sig.bitwiseAND(F.lit(1)), S._N_PLANES - 1))
    chunks = F.array(
        *[F.shiftrightunsigned(sig, i * rows).bitwiseAND(F.lit(mask)) for i in range(bands)],
        *[F.shiftrightunsigned(rot, i * rows).bitwiseAND(F.lit(mask)) for i in range(bands)],
    )
    return with_sig.select(F.col(id_col), F.col("__sig"),
                           F.posexplode(chunks).alias("band", "chunk"),
                           F.col("__v"), F.col("__n"))

def verified_pairs_c(banded, bands, threshold, id_col="vec_id"):
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
    score = dot("a.__v", "b.__v") / (F.col("a.__n") * F.col("b.__n"))
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

# warm
S.embedding_neardup_lsh(load_table(spark, "/root/testdata/sf0.001", "embeddings")).write.format("noop").mode("overwrite").save()

a_df = S.embedding_neardup_lsh(emb, threshold=0.4)
timeit("A current (3-fold HOF cosine)", a_df)

cb = banded_with_norm(emb, "vec_id", "embedding", S._BANDS)
c_df = verified_pairs_c(cb, S._BANDS, 0.4)
timeit("C carried-norm HOF dot", c_df)
timeit("A again", a_df)
timeit("C again", c_df)

ra = {(r.id1, r.id2): r.score for r in a_df.collect()}
rc = {(r.id1, r.id2): r.score for r in c_df.collect()}
assert set(ra) == set(rc), (len(ra), len(rc))
diff = [k for k in ra if ra[k] != rc[k]]
print("pairs:", len(ra), "score mismatches:", len(diff))
spark.stop()
