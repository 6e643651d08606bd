package graft

import graft.geom.Geom

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks over the geometry serde + predicate algebra
  * (raw ScalaCheck generators, deterministic seed, 100 samples each). */
class PropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failed")))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 100).foreach { i =>
      val a = g1.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(sys.error("gen failed"))
      val b = g2.apply(Gen.Parameters.default, Seed(4242L + i)).getOrElse(sys.error("gen failed"))
      f(a, b)
    }

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
  private val pointGen = for (x <- coord; y <- coord) yield Geom.point(x, y)
  private val envGen = for {
    x0 <- coord; y0 <- coord
    w <- Gen.chooseNum(0.001, 500.0); h <- Gen.chooseNum(0.001, 500.0)
  } yield Geom.polygonFromEnvelope(x0, y0, x0 + w, y0 + h)

  test("WKB roundtrip preserves any point/envelope exactly") {
    forAll(pointGen) { p =>
      assert(Geom.deserialize(Geom.serialize(p)).equalsExact(p))
    }
    forAll(envGen) { e =>
      assert(Geom.deserialize(Geom.serialize(e)).equalsExact(e))
    }
  }

  test("WKB/WKT roundtrips preserve Z, M and ZM points exactly") {
    // WKB is binary-exact; WKT is decimal text, so its legs get a 1e-12
    // relative tolerance
    def close(a: Double, b: Double): Boolean =
      a == b || math.abs(a - b) <= math.max(math.abs(a), math.abs(b)) * 1e-12
    val zGen = for (x <- coord; y <- coord; z <- coord) yield
      Geom.factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y, z))
    val mGen = for (x <- coord; y <- coord; m <- coord) yield
      Geom.factory.createPoint(new org.locationtech.jts.geom.CoordinateXYM(x, y, m))
    val zmGen = for (x <- coord; y <- coord; z <- coord; m <- coord) yield
      Geom.factory.createPoint(new org.locationtech.jts.geom.CoordinateXYZM(x, y, z, m))
    forAll(zGen) { p =>
      val r = Geom.deserialize(Geom.serialize(p))
      assert(r.equalsExact(p) && r.getCoordinate.getZ == p.getCoordinate.getZ)
      assert(close(Geom.fromWkt(Geom.toWkt(p)).getCoordinate.getZ, p.getCoordinate.getZ))
    }
    forAll(mGen) { p =>
      val r = Geom.deserialize(Geom.serialize(p))
      assert(r.getCoordinate.getM == p.getCoordinate.getM, s"M lost for $p")
      assert(java.lang.Double.isNaN(r.getCoordinate.getZ), s"phantom Z for $p")
      assert(close(Geom.fromWkt(Geom.toWkt(p)).getCoordinate.getM, p.getCoordinate.getM))
    }
    forAll(zmGen) { p =>
      val r = Geom.deserialize(Geom.serialize(p))
      assert(r.getCoordinate.getZ == p.getCoordinate.getZ &&
        r.getCoordinate.getM == p.getCoordinate.getM, s"Z/M lost for $p")
      val w = Geom.fromWkt(Geom.toWkt(p))
      assert(close(w.getCoordinate.getZ, p.getCoordinate.getZ) &&
        close(w.getCoordinate.getM, p.getCoordinate.getM))
    }
    // measured lines keep per-vertex Ms through ISO WKB too
    val mlineGen = for {
      x1 <- coord; m1 <- coord; x2 <- coord; m2 <- coord
    } yield Geom.factory.createLineString(Array[org.locationtech.jts.geom.Coordinate](
      new org.locationtech.jts.geom.CoordinateXYM(x1, 0, m1),
      new org.locationtech.jts.geom.CoordinateXYM(x2, 1, m2)))
    forAll(mlineGen) { l =>
      val r = Geom.deserialize(Geom.serializeIso(l)).asInstanceOf[org.locationtech.jts.geom.LineString]
      assert(r.getCoordinateSequence.getM(0) == l.getCoordinateSequence.getM(0))
      assert(r.getCoordinateSequence.getM(1) == l.getCoordinateSequence.getM(1))
    }
  }

  test("WKT roundtrip preserves coordinates") {
    forAll(pointGen) { p =>
      val back = Geom.fromWkt(Geom.toWkt(p))
      assert(back.equalsExact(p))
    }
  }

  test("predicate algebra: contains(a,b) == within(b,a), intersects == !disjoint") {
    forAll(envGen, pointGen) { (e, p) =>
      assert(e.contains(p) == p.within(e))
      assert(e.intersects(p) == !e.disjoint(p))
      // and through the SQL engine with prepared-literal path
      val eHex = Geom.serialize(e).map("%02x".format(_)).mkString
      val pHex = Geom.serialize(p).map("%02x".format(_)).mkString
      val row = spark.sql(
        s"""SELECT st_contains(unhex('$eHex'), unhex('$pHex')),
                   st_within(unhex('$pHex'), unhex('$eHex')),
                   st_intersects(unhex('$eHex'), unhex('$pHex')),
                   st_disjoint(unhex('$eHex'), unhex('$pHex'))""").head
      assert(row.getBoolean(0) == row.getBoolean(1))
      assert(row.getBoolean(2) == !row.getBoolean(3))
      assert(row.getBoolean(0) == e.contains(p))
    }
  }

  test("distance is symmetric and dwithin consistent with it") {
    forAll(pointGen, pointGen) { (a, b) =>
      val d = a.distance(b)
      assert(b.distance(a) == d)
      assert(a.isWithinDistance(b, d + 1e-9))
    }
  }

  test("tile cells always cover the geometry's own centroid cell") {
    forAll(envGen, Gen.chooseNum(1.0, 100.0)) { (e, cs) =>
      val c = e.getCentroid
      val cells = {
        import graft.functions.{StTileCells}
        import org.apache.spark.sql.catalyst.expressions.Literal
        StTileCells(Seq(Literal(Geom.serialize(e)), Literal(cs)))
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSet
      }
      val cc = graft.functions.StBbox.pack(
        math.floor(c.getX / cs).toLong, math.floor(c.getY / cs).toLong)
      assert(cells.contains(cc))
    }
  }

  test("CRS roundtrips: mercator and in-zone UTM invert to 1e-8 degrees") {
    import graft.geom.Crs
    val lonlat = for {
      lon <- Gen.chooseNum(-179.9, 179.9); lat <- Gen.chooseNum(-84.9, 84.9)
    } yield (lon, lat)
    forAll(lonlat) { case (lon, lat) =>
      val (x, y) = Crs.fromWgs(Crs.WebMercator, lon, lat)
      val (lo, la) = Crs.toWgs(Crs.WebMercator, x, y)
      assert(math.abs(lo - lon) < 1e-8 && math.abs(la - lat) < 1e-8, s"3857 ($lon,$lat)")
      val u = Crs.utmZoneFor(lon, lat)
      val (ux, uy) = Crs.fromWgs(u, lon, lat)
      val (ulo, ula) = Crs.toWgs(u, ux, uy)
      assert(math.abs(ulo - lon) < 1e-7 && math.abs(ula - lat) < 1e-7, s"utm${u.zone} ($lon,$lat)")
      assert(uy >= 0 && uy <= 10000000.0 + 1e-6, s"northing range ($lon,$lat) -> $uy")
    }
  }

  test("geohash: decode-center re-encodes to the same cell at any precision") {
    import graft.functions.GeoHash
    val gen = for {
      lon <- Gen.chooseNum(-179.9, 179.9); lat <- Gen.chooseNum(-89.9, 89.9)
      p <- Gen.chooseNum(1, 12)
    } yield (lon, lat, p)
    forAll(gen) { case (lon, lat, p) =>
      val h = GeoHash.encode(lon, lat, p)
      assert(h.length == p)
      val (clon, clat) = GeoHash.decodeCenter(h)
      assert(GeoHash.encode(clon, clat, p) == h, s"($lon,$lat,$p) -> $h")
      // cell contains the original point: longitude cell width is 180/2^(floor(5p/2))-ish;
      // just assert the re-encoded original matches (same cell membership)
      assert(GeoHash.encode(lon, lat, p) == h)
    }
  }

  test("hex grid: center re-encodes to its own cell; nearest-center property; kRing size") {
    import graft.functions.Hex
    val gen = for {
      x <- Gen.chooseNum(-500.0, 500.0); y <- Gen.chooseNum(-500.0, 500.0)
      size <- Gen.oneOf(0.5, 2.0, 7.5)
    } yield (x, y, size)
    forAll(gen) { case (x, y, size) =>
      val cell = Hex.cellOf(x, y, size)
      val (cx, cy) = Hex.center(cell, size)
      // the cell center is in its own cell
      assert(Hex.cellOf(cx, cy, size) == cell, s"center ($cx,$cy) left cell")
      // hexagon membership = nearest center: the assigned center is at
      // least as close as any neighbor's center (up to FP noise on edges)
      val own = math.hypot(x - cx, y - cy)
      Hex.kRing(cell, 1).filter(_ != cell).foreach { nb =>
        val (nx, ny) = Hex.center(nb, size)
        assert(own <= math.hypot(x - nx, y - ny) + 1e-9,
          s"($x,$y) closer to neighbor $nb than own cell $cell")
      }
      // center distance to the point never exceeds the circumradius
      assert(own <= size + 1e-9, s"center $own away > circumradius $size")
    }
    // kRing disk size is the centered hexagonal number 1 + 3k(k+1)
    for (k <- 0 to 4) {
      val ring = Hex.kRing(Hex.pack(3, -2), k)
      assert(ring.length == 1 + 3 * k * (k + 1))
      assert(ring.forall(c => Hex.dist(c, Hex.pack(3, -2)) <= k))
      assert(ring.toSet.size == ring.length)
    }
  }
}
