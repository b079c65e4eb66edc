"""Sources and sinks: seed sources live in the generator/facade; this
package holds output configuration and write paths."""
