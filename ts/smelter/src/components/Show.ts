/**
 * Show: gates children by time — either a [start, end] window on the
 * output timeline or a delay from mount.
 */
import { useContext, useEffect, useState } from 'react';
import type { ComponentBaseProps } from '../component.js';
import { SmelterContext } from '../context/index.js';
import { useAfterTimestamp } from '../hooks.js';

export type ShowProps = Omit<ComponentBaseProps, 'id'> & {
  /** Window on the output timeline when children render. */
  timeRangeMs?: { start?: number; end?: number };
  /** Delay from component mount before children render. */
  delayMs?: number;
};

function Show(props: ShowProps) {
  if (props.delayMs !== undefined && props.timeRangeMs) {
    throw new Error('"delayMs" and "timestamp" props can\'t be specified at the same time.');
  }
  if (props.timeRangeMs && props.timeRangeMs.start === undefined
      && props.timeRangeMs.end === undefined) {
    throw new Error('"timestampMs" prop needs to define at least one value "start" or "end".');
  }

  const ctx = useContext(SmelterContext);
  const [mountTimestampMs, setMountTimestampMs] = useState<number>(() =>
    ctx.timeContext.timestampMs()
  );
  const afterStart = useAfterTimestamp(props.timeRangeMs?.start ?? 0);
  const afterEnd = useAfterTimestamp(props.timeRangeMs?.end ?? Infinity);
  const afterDelay = useAfterTimestamp(mountTimestampMs + (props.delayMs ?? 0));

  useEffect(() => {
    setMountTimestampMs(ctx.timeContext.timestampMs());
  }, []);

  if (props.delayMs !== undefined && afterDelay) {
    return props.children;
  }
  if (props.timeRangeMs && afterStart && !afterEnd) {
    return props.children;
  }
  return null;
}

export default Show;
