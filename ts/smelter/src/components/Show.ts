/**
 * Show — gates children by time: either a [start, end] window on the
 * output timeline, or a delay measured from component mount.
 */
import type { ComponentBaseProps } from '../scene.js';
import { useAfterTimestamp } from '../hooks.js';
import { useMountTimestamp } from '../lifecycle.js';

export type ShowProps = Omit<ComponentBaseProps, 'id'> & {
  /** Window on the output timeline when children render. */
  timeRangeMs?: { start?: number; end?: number };
  /** Delay from component mount before children render. */
  delayMs?: number;
};

function Show({ children, timeRangeMs, delayMs }: ShowProps) {
  const mode =
    delayMs !== undefined && timeRangeMs ? 'conflict'
    : delayMs !== undefined ? 'delay'
    : timeRangeMs ? 'range'
    : 'empty';
  if (mode === 'conflict') {
    throw new Error('<Show> accepts either delayMs or timeRangeMs, not both.');
  }
  if (mode === 'range' && timeRangeMs?.start === undefined && timeRangeMs?.end === undefined) {
    throw new Error('<Show timeRangeMs> needs a start and/or an end.');
  }

  const mountMs = useMountTimestamp();
  // Hooks run unconditionally; the gates pick which answers matter.
  const gates = {
    delayElapsed: useAfterTimestamp(mountMs + (delayMs ?? 0)),
    windowOpen: useAfterTimestamp(timeRangeMs?.start ?? 0),
    windowClosed: useAfterTimestamp(timeRangeMs?.end ?? Infinity),
  };

  const visible =
    mode === 'delay' ? gates.delayElapsed
    : mode === 'range' ? gates.windowOpen && !gates.windowClosed
    : false;
  return visible ? children : null;
}

export default Show;
