package graft.tags;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the long-running drill suites (two-host cluster
 * flagship, multi-generation lifecycle drills). The default `sbt test` run
 * excludes them ({@code Test / testOptions += Tests.Argument("-l",
 * "graft.tags.Slow")} in build.sbt) so the driver's verification fits its
 * budget; run them explicitly with
 * {@code sbt "testOnly * -- -n graft.tags.Slow"}.
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface Slow {}
