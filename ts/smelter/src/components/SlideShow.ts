/**
 * SlideShow: renders one <Slide/> at a time, advancing when the current
 * slide's time-limited content (Mp4 durations, Show windows, nested
 * SlideShows) finishes — tracked through ChildrenLifetimeContext.
 */
import type React from 'react';
import type { ReactElement } from 'react';
import {
  Children,
  createElement,
  useCallback,
  useEffect,
  useRef,
  useState,
} from 'react';
import type { ComponentBaseProps } from '../component.js';
import {
  ChildrenLifetimeContext,
  ChildrenLifetimeContextType,
  useCompletableComponent,
  useTimeLimitedComponent,
} from '../context/childrenLifetimeContext.js';
import { useCurrentTimestamp } from '../hooks.js';
import View from './View.js';

export type SlideProps = Omit<ComponentBaseProps, 'id'> & {
  /** Slide duration; without it the slide lasts until its content finishes. */
  durationMs?: number;
};

export type SlideShowProps = {
  children: React.ReactNode;
};

export function SlideShow(props: SlideShowProps) {
  const prevChildrenRef = useRef<React.ReactNode>(undefined);
  const [childIndex, setChildIndex] = useState(0);

  const childrenArray = Children.toArray(props.children);
  for (const slide of childrenArray) {
    if ((slide as ReactElement).type !== Slide) {
      throw new Error('SlideShow component only accepts <Slide /> as children');
    }
  }

  // keep pointing at the same slide (by key) when the child list changes
  useEffect(() => {
    const next = Children.toArray(props.children);
    const remaining = Children.toArray(prevChildrenRef.current).slice(childIndex);
    const tracked = findTrackedIndex(remaining, next);
    if (tracked !== null && tracked !== childIndex) {
      setChildIndex(tracked);
    }
    prevChildrenRef.current = props.children;
  }, [props.children]);

  const [checkChildren, setCheckChildren] = useState(false);
  const onChildrenChange = useCallback(() => setCheckChildren(true), []);
  const [slideContext] = useState(() => new ChildrenLifetimeContext(onChildrenChange));

  useEffect(() => {
    if (checkChildren) {
      setCheckChildren(false);
      if (slideContext.isDone()) {
        setChildIndex(childIndex + 1);
      }
    }
  }, [checkChildren]);

  // report this SlideShow's lifetime upward (nested SlideShows)
  useCompletableComponent(childIndex >= childrenArray.length);

  return createElement(
    ChildrenLifetimeContextType.Provider,
    { value: slideContext },
    childrenArray[childIndex] ?? createElement(View, {})
  );
}

/** First index in `next` whose key matches any not-yet-shown old slide. */
function findTrackedIndex(
  remaining: ReturnType<typeof Children.toArray>,
  next: ReturnType<typeof Children.toArray>
): number | null {
  for (const prev of remaining) {
    for (const [index, child] of next.entries()) {
      if ((child as ReactElement).key === (prev as ReactElement).key) {
        return index;
      }
    }
  }
  return null;
}

export function Slide(props: SlideProps) {
  const [isolatedContext] = useState(
    () => new ChildrenLifetimeContext(() => undefined)
  );
  const currentTimestamp = useCurrentTimestamp();
  const [initTimestamp] = useState(currentTimestamp);

  const durationMs = props.durationMs ?? 1000;
  useTimeLimitedComponent(initTimestamp + durationMs);

  if (props.durationMs) {
    // fixed duration: isolate children lifetimes so they can't extend it
    return createElement(
      ChildrenLifetimeContextType.Provider,
      { value: isolatedContext },
      props.children
    );
  }
  return props.children;
}
